"""Native host-side data-plane sources (C++, built on demand with g++).

In a repo checkout this directory sits beside the Python package; installed,
it ships inside the wheel as ``vae_posterior_consistency_tpu.native`` (the
package-dir mapping in pyproject.toml) so the on-demand build in
``data/native_io.py`` finds ``vpc_io.cpp`` in either layout. The module has
no Python code — it exists so the .cpp travels as package data.
"""

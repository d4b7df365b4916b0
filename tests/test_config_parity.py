"""Regenerated default-config grids vs the reference's JSONL files.

Runs only where the read-only reference checkout is present (CI/user machines
skip); validates record order, vae_type grid, and every hyper-parameter default.
"""

import json
import os

import pytest

from vae_posterior_consistency_tpu.data import default_configs as dc

REFERENCE = "/root/reference/Data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not present"
)


def _load_ref(fname):
    path = os.path.join(REFERENCE, fname)
    return [json.loads(l) for l in open(path) if l.strip()]


@pytest.mark.parametrize(
    "fname,ours_fn",
    [("imputation_args.json", dc.mcar_records),
     ("imputation_args_mnar.json", dc.mnar_records)],
)
def test_default_records_match_reference(fname, ours_fn):
    ref = _load_ref(fname)
    ours = ours_fn()
    assert len(ours) == len(ref)
    for i, (r, o) in enumerate(zip(ref, ours)):
        assert o["vae_type"]["default"] == r["vae_type"]["default"], i
        for key, spec in r.items():
            if key not in o:
                continue  # reference-only fields (e.g. later additions)
            ref_default = spec["default"]
            our_default = o[key]["default"]
            if (isinstance(ref_default, str) and not ref_default.strip()
                    and isinstance(our_default, bool)):
                # the ONE reference quirk: bool defaults stored as " "
                # (mnar beta_annealing). Any other str-vs-non-str pair is a
                # real default drift and must fail, not be skipped.
                continue
            assert our_default == ref_default, (
                f"record {i} ({r['vae_type']['default']}), key {key}: "
                f"ours={our_default!r} ref={ref_default!r}"
            )

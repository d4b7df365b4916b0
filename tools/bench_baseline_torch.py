"""Measure the CPU-reference training-throughput baseline.

Recreates the reference's per-step cost structure for its flagship config
(Reg_VAE + kl_reg on a 12-feature UCI table, batch 64, Adam lr=1e-3 —
reference: src/experiment_main/train.py:21-116, model at src/models/VAE.py:
350-507) in torch on CPU, including its per-batch *host NumPy* mask draw
(reference: src/experiment_main/train.py:54-55) and eager two-branch
forward/loss/backward. The resulting samples/sec is the `vs_baseline`
denominator hard-coded in bench.py (re-measure with this script when the
host changes).
"""

import time

import numpy as np
import torch
import torch.nn as nn

OBS, LATENT, BATCH = 12, 10, 64


class RegVae(nn.Module):
    def __init__(self):
        super().__init__()
        self.enc = nn.Sequential(
            nn.Linear(OBS, 100), nn.ReLU(), nn.Linear(100, 50), nn.ReLU(),
            nn.Linear(50, 2 * LATENT),
        )
        self.dec = nn.Sequential(
            nn.Linear(LATENT, 50), nn.ReLU(), nn.Linear(50, 100), nn.ReLU(),
            nn.Linear(100, OBS), nn.Sigmoid(),
        )
        self.x_logvar = float(np.log((0.1 * np.sqrt(2)) ** 2))
        self.prior = torch.distributions.Normal(torch.zeros(LATENT),
                                                torch.ones(LATENT))

    def branch(self, x, m):
        mean, logvar = self.enc(x * m).chunk(2, dim=1)
        z = torch.distributions.Normal(mean, torch.exp(logvar / 2)).rsample()
        xm = self.dec(z)
        return mean, logvar, xm

    def loss(self, x, mask, mask_p):
        xlv = torch.full_like(x, self.x_logvar)

        def negll(t, mu, lv):
            d = torch.distributions.Normal(mu, torch.exp(lv / 2))
            return torch.sum(-d.log_prob(t))

        mq, lq, xq = self.branch(x, mask)
        mp, lp, xp = self.branch(x, mask_p)
        RE_q = negll(x * mask, xq * mask, xlv * mask)
        RE_p = negll(x * mask_p, xp * mask_p, xlv * mask_p)
        dq = torch.distributions.Normal(mq, torch.exp(lq / 2))
        dp = torch.distributions.Normal(mp, torch.exp(lp / 2))
        KL_q = torch.distributions.kl_divergence(dq, self.prior).sum()
        KL_p = torch.distributions.kl_divergence(dp, self.prior).sum()
        loss_q, loss_p = RE_q + KL_q, RE_p + KL_p
        KL_reg = torch.distributions.kl_divergence(dq, dp).sum()
        extra = mask * (1 - mask_p)
        RE_x = negll(x * extra, xq * extra, xlv * extra)
        return (loss_q + 1.0 * (KL_reg - loss_q + loss_p + RE_x)) / x.shape[0]


def main(warmup_steps=30, steps=300):
    torch.manual_seed(0)
    model = RegVae()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.rand(BATCH, OBS)
    mask = (torch.rand(BATCH, OBS) < 0.7).float()

    def step():
        # host NumPy mask draw, as the reference does every batch
        mp = torch.from_numpy(
            (np.random.rand(BATCH, OBS) < 0.7).astype(np.float32)
        ) * mask
        loss = model.loss(x, mask, mp)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return loss

    for _ in range(warmup_steps):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    sps = steps * BATCH / dt
    print(f"torch-CPU reference-equivalent: {steps} steps in {dt:.2f}s "
          f"-> {sps:.1f} samples/s ({steps/dt:.1f} steps/s)")
    return sps


if __name__ == "__main__":
    main()

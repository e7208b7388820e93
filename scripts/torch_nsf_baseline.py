"""PyTorch-CPU NSF baseline for bench.py.

The reference's NSF (`/root/reference/sbi/neural_nets/net_builders/flow.py:330-456`)
delegates to nflows, which is not installed in this image. This file is an
independent pure-torch implementation of the *same architecture* (piecewise
rational-quadratic coupling transforms with residual-net conditioners +
LU-linear mixing, Durkan et al. 2019 defaults: 50 hidden / 5 transforms /
10 bins / tail bound 3 / 2 blocks) so the CPU training-throughput baseline is
measured against equivalent math. Nothing here is copied from nflows or the
reference; the RQ-spline equations are the published ones (Neural Spline
Flows, Eqs. 4-8).

Also provides a flow-potential baseline for the NLE-like slice-sampling
benchmark: the reference's numpy FSM sampler driving this torch flow's
log_prob per iteration, mirroring the reference's real NLE hot loop
(`sbi/samplers/mcmc/slice_numpy.py:353` calling a torch flow each step).
"""

from __future__ import annotations

import math
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

DEFAULT_EPS = 1e-3


def rqs_forward(x, widths, heights, derivs, tail_bound=3.0, inverse=False):
    """Monotonic rational-quadratic spline with linear tails.

    x: (..., D); widths/heights: (..., D, K) unnormalized; derivs: (..., D, K-1)
    unnormalized interior derivatives. Returns (y, log_det_per_elem).
    """
    K = widths.shape[-1]
    inside = (x > -tail_bound) & (x < tail_bound)

    w = F.softmax(widths, dim=-1)
    w = DEFAULT_EPS + (1 - DEFAULT_EPS * K) * w
    h = F.softmax(heights, dim=-1)
    h = DEFAULT_EPS + (1 - DEFAULT_EPS * K) * h
    d = DEFAULT_EPS + F.softplus(derivs)
    # boundary derivatives = 1 for linear tails
    pad = torch.ones_like(d[..., :1])
    d = torch.cat([pad, d, pad], dim=-1)  # (..., D, K+1)

    cumw = torch.cumsum(w, dim=-1) * 2 * tail_bound - tail_bound
    cumw = F.pad(cumw, (1, 0), value=-tail_bound)
    cumh = torch.cumsum(h, dim=-1) * 2 * tail_bound - tail_bound
    cumh = F.pad(cumh, (1, 0), value=-tail_bound)

    xc = x.clamp(-tail_bound, tail_bound)
    ref = cumh if inverse else cumw
    idx = (torch.searchsorted(ref[..., :-1].contiguous(), xc.unsqueeze(-1).contiguous(), right=True) - 1).clamp(0, K - 1)

    def g(t, i):
        return t.gather(-1, i).squeeze(-1)

    x_k = g(cumw, idx)
    y_k = g(cumh, idx)
    w_k = g(w, idx) * 2 * tail_bound
    h_k = g(h, idx) * 2 * tail_bound
    d_k = g(d, idx)
    d_k1 = g(d, idx + 1)
    s_k = h_k / w_k

    if not inverse:
        t = (xc - x_k) / w_k
        t1 = t * (1 - t)
        num = h_k * (s_k * t**2 + d_k * t1)
        den = s_k + (d_k1 + d_k - 2 * s_k) * t1
        y = y_k + num / den
        dnum = s_k**2 * (d_k1 * t**2 + 2 * s_k * t1 + d_k * (1 - t) ** 2)
        logdet = torch.log(dnum) - 2 * torch.log(den)
        y = torch.where(inside, y, x)
        logdet = torch.where(inside, logdet, torch.zeros_like(logdet))
        return y, logdet
    else:
        yv = xc
        a = h_k * (s_k - d_k) + (yv - y_k) * (d_k1 + d_k - 2 * s_k)
        b = h_k * d_k - (yv - y_k) * (d_k1 + d_k - 2 * s_k)
        c = -s_k * (yv - y_k)
        disc = b**2 - 4 * a * c
        t = 2 * c / (-b - torch.sqrt(disc.clamp_min(1e-12)))
        x_out = t * w_k + x_k
        t1 = t * (1 - t)
        den = s_k + (d_k1 + d_k - 2 * s_k) * t1
        dnum = s_k**2 * (d_k1 * t**2 + 2 * s_k * t1 + d_k * (1 - t) ** 2)
        logdet = -(torch.log(dnum) - 2 * torch.log(den))
        x_out = torch.where(inside, x_out, x)
        logdet = torch.where(inside, logdet, torch.zeros_like(logdet))
        return x_out, logdet


class ResidualConditioner(nn.Module):
    def __init__(self, in_dim, context_dim, out_dim, hidden=50, blocks=2):
        super().__init__()
        self.inp = nn.Linear(in_dim + context_dim, hidden)
        self.blocks = nn.ModuleList(
            [nn.Sequential(nn.Linear(hidden, hidden), nn.ReLU(), nn.Linear(hidden, hidden)) for _ in range(blocks)]
        )
        self.out = nn.Linear(hidden, out_dim)

    def forward(self, x, ctx):
        h = self.inp(torch.cat([x, ctx], dim=-1))
        for b in self.blocks:
            h = F.relu(h + b(F.relu(h)))
        return self.out(h)


class LULinear(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim
        self.lower = nn.Parameter(torch.zeros(dim, dim))
        self.upper = nn.Parameter(torch.zeros(dim, dim))
        self.log_diag = nn.Parameter(torch.zeros(dim))
        perm = torch.randperm(dim)
        self.register_buffer("perm", perm)

    def forward(self, x):
        L = torch.tril(self.lower, -1) + torch.eye(self.dim)
        U = torch.triu(self.upper, 1) + torch.diag(torch.exp(self.log_diag))
        y = (x[..., self.perm] @ U.T) @ L.T
        return y, self.log_diag.sum().expand(x.shape[:-1])


class CouplingNSF(nn.Module):
    def __init__(self, dim, context_dim, hidden=50, transforms=5, bins=10, tail=3.0, blocks=2):
        super().__init__()
        self.dim = dim
        self.tail = tail
        self.bins = bins
        self.masks = []
        self.conditioners = nn.ModuleList()
        self.linears = nn.ModuleList()
        for i in range(transforms):
            mask = torch.arange(dim) % 2 == (i % 2)
            self.register_buffer(f"mask_{i}", mask)
            self.masks.append(mask)
            n_id = int(mask.sum())
            n_tr = dim - n_id
            self.conditioners.append(
                ResidualConditioner(n_id, context_dim, n_tr * (3 * bins - 1), hidden, blocks)
            )
            self.linears.append(LULinear(dim))

    def log_prob(self, theta, x):
        z = theta
        total = torch.zeros(theta.shape[:-1])
        for i, cond in enumerate(self.conditioners):
            z, ld = self.linears[i](z)
            total = total + ld
            mask = getattr(self, f"mask_{i}")
            z_id, z_tr = z[..., mask], z[..., ~mask]
            p = cond(z_id, x).reshape(*z_tr.shape, 3 * self.bins - 1)
            w, h, d = p[..., : self.bins], p[..., self.bins : 2 * self.bins], p[..., 2 * self.bins :]
            z_tr, ld = rqs_forward(z_tr, w, h, d, self.tail)
            total = total + ld.sum(-1)
            out = torch.empty_like(z)
            out[..., mask] = z_id
            out[..., ~mask] = z_tr
            z = out
        base = -0.5 * (z**2).sum(-1) - 0.5 * self.dim * math.log(2 * math.pi)
        return base + total


def measure_train_steps_per_sec(theta_dim=5, x_dim=8, batch=200, steps=60, warmup=10, seed=0):
    torch.manual_seed(seed)
    flow = CouplingNSF(theta_dim, x_dim)
    opt = torch.optim.Adam(flow.parameters(), lr=5e-4)
    theta = torch.randn(batch, theta_dim)
    x = torch.randn(batch, x_dim)

    def step():
        opt.zero_grad()
        loss = -flow.log_prob(theta, x).mean()
        loss.backward()
        nn.utils.clip_grad_norm_(flow.parameters(), 5.0)
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    return steps / (time.perf_counter() - t0)


def make_flow_potential(theta_dim=5, x_dim=8, seed=0):
    """A fixed torch NSF likelihood-potential (NLE hot loop): flow models
    p(x | theta); potential(theta) = log p(x_o | theta)."""
    torch.manual_seed(seed)
    flow = CouplingNSF(x_dim, theta_dim)
    flow.eval()
    x_o = torch.randn(1, x_dim)

    def potential(theta_np):
        with torch.no_grad():
            t = torch.as_tensor(np.atleast_2d(theta_np), dtype=torch.float32)
            return flow.log_prob(x_o.expand(t.shape[0], -1), t).numpy()

    return potential


if __name__ == "__main__":
    print("train steps/s:", measure_train_steps_per_sec())

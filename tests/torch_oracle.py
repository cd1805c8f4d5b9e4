"""Independent PyTorch RWKV-7 oracle for cross-framework parity testing.

A clean-room CPU/fp32 implementation of the RWKV-7 block math (naive
per-step recurrence), structured so its ``state_dict()`` uses the reference
checkpoint key layout (blocks.N.att.receptance.weight [out,in], (1,1,C)
time-mix params, GroupNorm ln_x) — exercising the .pth converter end to end.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class TMix(nn.Module):
    def __init__(self, C, H, layer_id, d_decay, d_aaa, d_mv, d_gate, hsd=8):
        super().__init__()
        self.H, self.N, self.layer_id = H, C // H, layer_id
        ones = lambda: nn.Parameter(torch.randn(1, 1, C) * 0.1)
        for n in ("x_r", "x_w", "x_k", "x_v", "x_a", "x_g"):
            setattr(self, n, ones())
        self.w0 = nn.Parameter(torch.randn(1, 1, C) * 0.5 - 4.0)
        self.w1 = nn.Parameter(torch.randn(C, d_decay) * 0.02)
        self.w2 = nn.Parameter(torch.randn(d_decay, C) * 0.02)
        self.a0 = nn.Parameter(torch.randn(1, 1, C) * 0.1)
        self.a1 = nn.Parameter(torch.randn(C, d_aaa) * 0.02)
        self.a2 = nn.Parameter(torch.randn(d_aaa, C) * 0.02)
        if layer_id != 0:
            self.v0 = nn.Parameter(torch.randn(1, 1, C) * 0.1 + 1.0)
            self.v1 = nn.Parameter(torch.randn(C, d_mv) * 0.02)
            self.v2 = nn.Parameter(torch.randn(d_mv, C) * 0.02)
        self.g1 = nn.Parameter(torch.randn(C, d_gate) * 0.02)
        self.g2 = nn.Parameter(torch.randn(d_gate, C) * 0.02)
        self.k_k = nn.Parameter(torch.rand(1, 1, C))
        self.k_a = nn.Parameter(torch.rand(1, 1, C))
        self.r_k = nn.Parameter(torch.randn(H, C // H) * 0.1)
        self.receptance = nn.Linear(C, C, bias=False)
        self.key = nn.Linear(C, C, bias=False)
        self.value = nn.Linear(C, C, bias=False)
        self.output = nn.Linear(C, C, bias=False)
        self.ln_x = nn.GroupNorm(H, C, eps=1e-5 * hsd**2)

    def forward(self, x, v_first):
        B, T, C = x.shape
        H, N = self.H, self.N
        xx = F.pad(x, (0, 0, 1, -1)) - x
        xr, xw, xk, xv, xa, xg = (
            x + xx * getattr(self, n) for n in ("x_r", "x_w", "x_k", "x_v", "x_a", "x_g")
        )
        r = self.receptance(xr)
        w_raw = -F.softplus(-(self.w0 + torch.tanh(xw @ self.w1) @ self.w2)) - 0.5
        k = self.key(xk)
        v = self.value(xv)
        if self.layer_id == 0:
            v_first = v
        else:
            v = v + (v_first - v) * torch.sigmoid(self.v0 + (xv @ self.v1) @ self.v2)
        a = torch.sigmoid(self.a0 + (xa @ self.a1) @ self.a2)
        g = torch.sigmoid(xg @ self.g1) @ self.g2
        kk = F.normalize((k * self.k_k).view(B, T, H, N), dim=-1, p=2.0).view(B, T, C)
        k = k * (1 + (a - 1) * self.k_a)

        # naive recurrence, state [B, H, N_v, N_k]
        aa, bb = -kk, kk * a
        w = torch.exp(-torch.exp(w_raw))
        S = torch.zeros(B, H, N, N)
        ys = []
        for t in range(T):
            rt, wt, kt, vt, at, bt = (
                z[:, t].view(B, H, N) for z in (r, w, k, v, aa, bb)
            )
            sa = torch.einsum("bhij,bhj->bhi", S, at)
            S = (
                S * wt[:, :, None, :]
                + sa[..., None] * bt[:, :, None, :]
                + vt[..., None] * kt[:, :, None, :]
            )
            ys.append(torch.einsum("bhij,bhj->bhi", S, rt).reshape(B, C))
        y = torch.stack(ys, dim=1)
        y = self.ln_x(y.view(B * T, C)).view(B, T, C)
        y = y + (
            (r.view(B, T, H, N) * k.view(B, T, H, N) * self.r_k).sum(-1, keepdim=True)
            * v.view(B, T, H, N)
        ).view(B, T, C)
        return self.output(y * g), v_first


class CMix(nn.Module):
    def __init__(self, C, dim_ffn):
        super().__init__()
        self.x_k = nn.Parameter(torch.randn(1, 1, C) * 0.1)
        self.key = nn.Linear(C, dim_ffn, bias=False)
        self.value = nn.Linear(dim_ffn, C, bias=False)

    def forward(self, x):
        xx = F.pad(x, (0, 0, 1, -1)) - x
        k = torch.relu(self.key(x + xx * self.x_k)) ** 2
        return self.value(k)


class Block(nn.Module):
    def __init__(self, C, H, layer_id, dim_ffn, loras):
        super().__init__()
        if layer_id == 0:
            self.ln0 = nn.LayerNorm(C)
        self.ln1 = nn.LayerNorm(C)
        self.ln2 = nn.LayerNorm(C)
        self.att = TMix(C, H, layer_id, *loras)
        self.ffn = CMix(C, dim_ffn)

    def forward(self, x, v_first):
        if hasattr(self, "ln0"):
            x = self.ln0(x)
        y, v_first = self.att(self.ln1(x), v_first)
        x = x + y
        x = x + self.ffn(self.ln2(x))
        return x, v_first


class RWKV7Oracle(nn.Module):
    def __init__(self, n_layer, C, H, vocab, dim_ffn, loras):
        super().__init__()
        self.emb = nn.Embedding(vocab, C)
        self.blocks = nn.ModuleList(
            [Block(C, H, i, dim_ffn, loras) for i in range(n_layer)]
        )
        self.ln_out = nn.LayerNorm(C)
        self.head = nn.Linear(C, vocab, bias=False)

    @torch.no_grad()
    def forward(self, idx):
        x = self.emb(idx)
        v_first = None
        for b in self.blocks:
            x, v_first = b(x, v_first)
        return self.head(self.ln_out(x))

"""PyTorch (CPU) comparison twin of examples/pydynet/transformer.py.

1-layer encoder (dim 512, 4 heads) on synthetic CoLA-shaped data — the
reference's benchmark config (README.md:153) — for timing side-by-side with
the pydynet_tpu version.
"""
import argparse
import math
import time

import numpy as np
import torch
from torch import nn


def synthetic_cola(n=2048, vocab=1000, max_len=45, seed=0):
    rng = np.random.RandomState(seed)
    lengths = rng.randint(4, max_len + 1, n)
    X = np.zeros((n, max_len), np.int64)
    for i, L in enumerate(lengths):
        X[i, :L] = rng.randint(1, vocab, L)
    w = rng.randn(vocab)
    score = np.array([w[row[row > 0]].mean() for row in X])
    y = (score > 0).astype(np.int64)
    return X, y


class Encoder(nn.Module):
    def __init__(self, vocab, d=512, heads=4, expansion=2, max_len=45):
        super().__init__()
        self.embed = nn.Embedding(vocab, d, padding_idx=0)
        pos = torch.arange(max_len)[:, None]
        div = torch.exp(torch.arange(0, d, 2) * (-math.log(1e4) / d))
        pe = torch.zeros(max_len, d)
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe)
        layer = nn.TransformerEncoderLayer(d, heads, expansion * d,
                                           dropout=0.0, batch_first=True)
        self.enc = nn.TransformerEncoder(layer, 1)
        self.head = nn.Linear(d, 1)

    def forward(self, x):
        pad = x == 0
        h = self.embed(x) + self.pe[None, :x.shape[1]]
        h = self.enc(h, src_key_padding_mask=pad)
        h = (h * (~pad)[..., None]).sum(1) / (~pad).sum(1, keepdim=True)
        return self.head(h)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--samples", type=int, default=2048)
    args = p.parse_args(argv)

    np.random.seed(42)
    torch.manual_seed(42)
    X, y = synthetic_cola(n=args.samples)
    y = y.astype(np.float32)
    y[y == 0] = -1
    cut = int(0.8 * len(X))
    perm = np.random.permutation(len(X))
    Xtr, Xte = X[perm[:cut]], X[perm[cut:]]
    ytr, yte = y[perm[:cut]], y[perm[cut:]]
    Xtr, Xte = torch.from_numpy(Xtr), torch.from_numpy(Xte)
    ytr, yte = torch.from_numpy(ytr), torch.from_numpy(yte)

    net = Encoder(int(X.max()) + 1)
    opt = torch.optim.Adam(net.parameters(), lr=args.lr)

    for epoch in range(args.epochs):
        t0 = time.time()
        net.train()
        perm = torch.randperm(len(Xtr))
        for i in range(0, len(Xtr), args.batch_size):
            idx = perm[i:i + args.batch_size]
            opt.zero_grad()
            score = torch.tanh(net(Xtr[idx])).reshape(-1)
            loss = ((score - ytr[idx]) ** 2).mean()
            loss.backward()
            opt.step()
        net.eval()
        with torch.no_grad():
            acc = (torch.sign(torch.tanh(net(Xte)).reshape(-1))
                   == yte).float().mean().item()
        print(f"epoch {epoch:2d}: loss={loss.item():.4f} "
              f"test_acc={acc:.4f} ({time.time() - t0:.3f}s)")


if __name__ == "__main__":
    main()

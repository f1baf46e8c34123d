"""PyTorch (CPU) comparison twin of examples/pydynet/ts_prediction.py:
GRU(1->32) one-step-ahead forecasting on a synthetic periodic signal."""
import argparse
import time

import numpy as np
import torch
from torch import nn

TIME_STEP = 40
H_SIZE = 32


def f(t):
    return np.sin(np.pi * t) + 0.5 * np.cos(2 * np.pi * t)


def windowize(y, input_len, horizon=1):
    idx = np.arange(len(y) - input_len - horizon + 1)
    X = np.stack([y[i:i + input_len] for i in idx])
    Y = np.stack([y[i + input_len:i + input_len + horizon] for i in idx])
    return (torch.from_numpy(X[..., None].astype(np.float32)),
            torch.from_numpy(Y.astype(np.float32)))


class RNN(nn.Module):
    def __init__(self):
        super().__init__()
        self.rnn = nn.GRU(1, H_SIZE, num_layers=1, batch_first=True)
        self.out = nn.Linear(H_SIZE, 1)

    def forward(self, x):
        _, h = self.rnn(x)
        return self.out(h[-1])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=50)
    args = p.parse_args(argv)

    np.random.seed(0)
    torch.manual_seed(0)
    steps = np.arange(0, 100, .05)
    X, Y = windowize(f(steps), TIME_STEP)
    perm = np.random.default_rng(42).permutation(len(X))
    cut = int(len(X) * 0.8)
    Xtr, Xte = X[perm[:cut]], X[perm[cut:]]
    Ytr, Yte = Y[perm[:cut]], Y[perm[cut:]]

    net = RNN()
    opt = torch.optim.Adam(net.parameters(), lr=0.01)
    crit = nn.MSELoss()

    t0 = time.time()
    for epoch in range(args.epochs):
        opt.zero_grad()
        loss = crit(net(Xtr), Ytr)
        loss.backward()
        opt.step()
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            with torch.no_grad():
                test = crit(net(Xte), Yte).item()
            print(f"epoch {epoch:3d}: train={loss.item():.5f} "
                  f"test={test:.5f}")
    print(f"total: {time.time() - t0:.3f}s for {args.epochs} epochs")


if __name__ == "__main__":
    main()

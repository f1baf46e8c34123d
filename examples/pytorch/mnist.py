"""PyTorch (CPU) comparison twin of examples/pydynet/mnist.py.

Same role as the reference's examples/pytorch/mnist.py: the identical model
and data shapes in PyTorch, for timing side-by-side with the pydynet_tpu
version (`python -m examples.pytorch.mnist` vs
`python -m examples.pydynet.mnist`).  Uses the same synthetic-MNIST fallback
shapes so the comparison runs offline.
"""
import argparse
import time

import numpy as np
import torch
from torch import nn
import torch.nn.functional as F


def synthetic_mnist(n_train=4096, n_test=1024, seed=0):
    rng = np.random.RandomState(seed)
    Xtr = rng.rand(n_train, 1, 28, 28).astype(np.float32)
    ytr = rng.randint(0, 10, n_train)
    Xte = rng.rand(n_test, 1, 28, 28).astype(np.float32)
    yte = rng.randint(0, 10, n_test)
    return (Xtr, ytr), (Xte, yte)


class MLP(nn.Module):
    def __init__(self):
        super().__init__()
        self.net = nn.Sequential(nn.Flatten(), nn.Linear(784, 512),
                                 nn.ReLU(), nn.Linear(512, 512), nn.ReLU(),
                                 nn.Linear(512, 10))

    def forward(self, x):
        return self.net(x)


class ConvNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.c1 = nn.Conv2d(1, 10, 5)
        self.c2 = nn.Conv2d(10, 20, 5)
        self.f1 = nn.Linear(320, 50)
        self.f2 = nn.Linear(50, 10)

    def forward(self, x):
        x = F.relu(F.max_pool2d(self.c1(x), 2))
        x = F.relu(F.max_pool2d(self.c2(x), 2))
        x = x.reshape(x.shape[0], -1)
        return self.f2(F.relu(self.f1(x)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--network", choices=["mlp", "conv"], default="conv")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    torch.manual_seed(args.seed)
    (Xtr, ytr), (Xte, yte) = synthetic_mnist()
    Xtr, ytr = torch.from_numpy(Xtr), torch.from_numpy(ytr)
    Xte, yte = torch.from_numpy(Xte), torch.from_numpy(yte)

    net = MLP() if args.network == "mlp" else ConvNet()
    opt = torch.optim.Adam(net.parameters(), lr=args.lr)

    for epoch in range(args.epochs):
        t0 = time.time()
        net.train()
        perm = torch.randperm(len(Xtr))
        for i in range(0, len(Xtr), args.batch_size):
            idx = perm[i:i + args.batch_size]
            opt.zero_grad()
            loss = F.cross_entropy(net(Xtr[idx]), ytr[idx])
            loss.backward()
            opt.step()
        net.eval()
        with torch.no_grad():
            acc = (net(Xte).argmax(-1) == yte).float().mean().item()
        print(f"epoch {epoch:2d}: loss={loss.item():.4f} "
              f"test_acc={acc:.4f} ({time.time() - t0:.3f}s)")


if __name__ == "__main__":
    main()

"""PyTorch (CPU) comparison twin of examples/pydynet/dropout_bn.py:
plain/Dropout/BatchNorm MLPs trained side-by-side on (synthetic)
olivetti-shaped faces."""
import argparse
import time

import numpy as np
import torch
from torch import nn
import torch.nn.functional as F


def load_faces():
    rng = np.random.default_rng(0)
    protos = rng.uniform(0, 1, (40, 4096)).astype(np.float32)
    y = np.repeat(np.arange(40), 10).astype(np.int64)
    X = protos[y] + 0.25 * rng.standard_normal((400, 4096)).astype(np.float32)
    return np.clip(X, 0, 1), y


class DNN(nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = nn.Linear(4096, 512)
        self.fc2 = nn.Linear(512, 128)
        self.fc3 = nn.Linear(128, 40)

    def forward(self, x):
        return self.fc3(F.relu(self.fc2(F.relu(self.fc1(x)))))


class DNNDropout(DNN):
    def __init__(self):
        super().__init__()
        self.dropout = nn.Dropout(0.05)

    def forward(self, x):
        x = F.relu(self.dropout(self.fc1(x)))
        x = F.relu(self.dropout(self.fc2(x)))
        return self.fc3(x)


class DNNBN(DNN):
    def __init__(self):
        super().__init__()
        self.bn1 = nn.BatchNorm1d(512)
        self.bn2 = nn.BatchNorm1d(128)

    def forward(self, x):
        x = F.relu(self.bn1(self.fc1(x)))
        x = F.relu(self.bn2(self.fc2(x)))
        return self.fc3(x)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=40)
    args = p.parse_args(argv)

    torch.manual_seed(0)
    X, y = load_faces()
    perm = np.random.default_rng(42).permutation(len(X))
    cut = int(len(X) * 0.8)
    Xtr = torch.from_numpy(X[perm[:cut]])
    ytr = torch.from_numpy(y[perm[:cut]])
    Xte = torch.from_numpy(X[perm[cut:]])
    yte = torch.from_numpy(y[perm[cut:]])

    nets = {"plain": DNN(), "dropout": DNNDropout(), "bn": DNNBN()}
    opts = {k: torch.optim.Adam(n.parameters(), lr=1e-4)
            for k, n in nets.items()}

    t0 = time.time()
    for epoch in range(args.epochs):
        for k, net in nets.items():
            net.train()
            perm = torch.randperm(len(Xtr))
            for i in range(0, len(Xtr), args.batch_size):
                idx = perm[i:i + args.batch_size]
                opts[k].zero_grad()
                loss = F.cross_entropy(net(Xtr[idx]), ytr[idx])
                loss.backward()
                opts[k].step()
        accs = {}
        for k, net in nets.items():
            net.eval()
            with torch.no_grad():
                accs[k] = (net(Xte).argmax(-1) == yte).float().mean().item()
        print(f"epoch {epoch:2d}: " +
              " ".join(f"{k}={v:.3f}" for k, v in accs.items()))
    print(f"total: {time.time() - t0:.3f}s")


if __name__ == "__main__":
    main()

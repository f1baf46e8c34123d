"""Dropout / BatchNorm comparison on face classification (parity with the
reference's examples/pydynet/dropout_bn.py): three MLP variants trained
simultaneously on the SAME batches with a single backward over the summed
losses — exercising the global-tape multi-loss semantics — each step one
compiled XLA program.

Falls back to synthetic olivetti-shaped data offline (the reference fetches
sklearn's olivetti faces, which needs network access).
"""
import numpy as np

import pydynet_tpu as pdn
import pydynet_tpu.nn.functional as F
from pydynet_tpu import nn
from pydynet_tpu.optim import Adam
from pydynet_tpu.data import data_loader

DTYPE = np.float32


def load_faces():
    try:
        from sklearn.datasets import fetch_olivetti_faces
        X, y = fetch_olivetti_faces(return_X_y=True)
        return X.astype(DTYPE), y.astype(np.int64)
    except Exception:
        print("olivetti fetch unavailable -> synthetic face-shaped data")
        rng = np.random.default_rng(0)
        protos = rng.uniform(0, 1, (40, 4096)).astype(DTYPE)
        y = np.repeat(np.arange(40), 10).astype(np.int64)
        X = protos[y] + 0.25 * rng.standard_normal(
            (400, 4096)).astype(DTYPE)
        return np.clip(X, 0, 1), y


class DNN(nn.Module):

    def __init__(self) -> None:
        super().__init__()
        self.fc1 = nn.Linear(4096, 512, dtype=DTYPE)
        self.fc2 = nn.Linear(512, 128, dtype=DTYPE)
        self.fc3 = nn.Linear(128, 40, dtype=DTYPE)

    def forward(self, x):
        x = F.relu(self.fc1(x))
        x = F.relu(self.fc2(x))
        return self.fc3(x)


class DNN_dropout(DNN):

    def __init__(self) -> None:
        super().__init__()
        self.dropout = nn.Dropout(p=0.05)

    def forward(self, x):
        x = F.relu(self.dropout(self.fc1(x)))
        x = F.relu(self.dropout(self.fc2(x)))
        return self.fc3(x)


class DNN_BN(DNN):

    def __init__(self) -> None:
        super().__init__()
        self.bn1 = nn.BatchNorm1d(512, dtype=DTYPE)
        self.bn2 = nn.BatchNorm1d(128, dtype=DTYPE)

    def forward(self, x):
        x = F.relu(self.bn1(self.fc1(x)))
        x = F.relu(self.bn2(self.fc2(x)))
        return self.fc3(x)


def main(epochs: int = 10, batch_size: int = 40):
    np.random.seed(42)
    pdn.manual_seed(42)
    device = ("cuda:{}".format(pdn.cuda.device_count() - 1)
              if pdn.cuda.is_available() else "cpu")

    X, y = load_faces()
    cut = int(0.8 * len(X))
    perm = np.random.permutation(len(X))
    train_X, test_X = X[perm[:cut]], X[perm[cut:]]
    train_y, test_y = y[perm[:cut]], y[perm[cut:]]

    nets = [DNN().to(device), DNN_dropout().to(device), DNN_BN().to(device)]
    optims = [Adam(n.parameters(), lr=5e-5) for n in nets]
    loss_fn = nn.CrossEntropyLoss()

    def train_step(bx, by):
        # three losses, ONE backward over the shared tape
        losses = [loss_fn(net(bx), by) for net in nets]
        for opt in optims:
            opt.zero_grad()
        (losses[0] + losses[1] + losses[2]).backward()
        for opt in optims:
            opt.step()
        return losses[0], losses[1], losses[2]

    def eval_step(bx):
        return tuple(net(bx).argmax(-1) for net in nets)

    jtrain = pdn.jit(train_step, state=(nets, optims))
    jeval = pdn.jit(eval_step, state=(nets,))

    train_loader = data_loader(train_X, train_y, batch_size, True)
    dev = pdn.Device(device)
    accs = None
    for epoch in range(epochs):
        for net in nets:
            net.train()
        for bx, by in train_loader:
            ls = jtrain(pdn.Tensor(bx, device=dev),
                        pdn.Tensor(by, device=dev))
        for net in nets:
            net.eval()
        with pdn.no_grad():
            preds = jeval(pdn.Tensor(test_X, device=dev))
            accs = [float((p.numpy() == test_y).mean()) for p in preds]
        print("epoch {:2d}: losses=({:.4f}, {:.4f}, {:.4f}) "
              "test_acc=(plain={:.3f}, dropout={:.3f}, bn={:.3f})".format(
                  epoch, ls[0].item(), ls[1].item(), ls[2].item(), *accs))
    return accs


if __name__ == "__main__":
    main(epochs=20)

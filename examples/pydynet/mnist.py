"""MNIST classification — MLP or LeNet-style ConvNet.

CLI parity with /root/reference/examples/pydynet/mnist.py (same flags,
network definitions, per-epoch accuracy report).  TPU-native execution: the
imperative train/eval step functions are compiled once with
``pydynet_tpu.jit`` so each batch is a single XLA program on the chip, and
fixed batch shapes (drop_last + a separately-shaped tail batch) keep
recompiles to two per network.

Falls back to a synthetic MNIST-shaped dataset when the gz files are absent
(this sandbox has no network access).
"""
import argparse
import gzip
import time
from os.path import exists, join

import numpy as np

import pydynet_tpu as pdn
from pydynet_tpu import nn
import pydynet_tpu.nn.functional as F
from pydynet_tpu.optim import Adam
from pydynet_tpu.data import data_loader


class MNISTDataset:

    def __init__(self, root) -> None:
        self.root = root
        self.paths = {
            "train_x": join(root, "train-images-idx3-ubyte.gz"),
            "train_y": join(root, "train-labels-idx1-ubyte.gz"),
            "test_x": join(root, "t10k-images-idx3-ubyte.gz"),
            "test_y": join(root, "t10k-labels-idx1-ubyte.gz"),
        }

    def available(self):
        return all(exists(p) for p in self.paths.values())

    @staticmethod
    def _read_images(path):
        with gzip.open(path, "r") as f:
            f.read(16)
            data = np.frombuffer(f.read(), dtype=np.uint8)
        return (data / 255.0).reshape(-1, 1, 28, 28)

    @staticmethod
    def _read_labels(path):
        with gzip.open(path, "r") as f:
            f.read(8)
            return np.frombuffer(f.read(), dtype=np.uint8).astype(np.int64)

    def load(self, split):
        x = self._read_images(self.paths[f"{split}_x"])
        y = self._read_labels(self.paths[f"{split}_y"])
        return x, y


def synthetic_mnist(n_train=4096, n_test=1024, seed=0):
    """Class-conditional gaussian blobs in image space: learnable, fast."""
    rng = np.random.default_rng(seed)
    protos = rng.uniform(0, 1, size=(10, 1, 28, 28))

    def make(n):
        y = rng.integers(0, 10, n)
        x = protos[y] + 0.35 * rng.standard_normal((n, 1, 28, 28))
        return np.clip(x, 0, 1), y.astype(np.int64)

    return make(n_train), make(n_test)


class Flatten(nn.Module):

    def forward(self, x):
        return x.reshape(x.shape[0], -1)


class MLP(nn.Module):

    def __init__(self) -> None:
        super().__init__()
        self.layer1 = nn.Sequential(Flatten(),
                                    nn.Linear(28 * 28, 1024, dtype=DTYPE))
        self.layer2 = nn.Linear(1024, 1024, dtype=DTYPE)
        self.layer3 = nn.Linear(1024, 10, dtype=DTYPE)

    def forward(self, x):
        z1 = F.relu(self.layer1(x))
        z2 = F.relu(self.layer2(z1))
        return self.layer3(z2)


class ConvNet(nn.Module):

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 20, 3, 1, 1, dtype=DTYPE)
        self.conv2 = nn.Conv2d(20, 50, 3, 1, 1, dtype=DTYPE)
        self.fc1 = nn.Linear(7 * 7 * 50, 500, dtype=DTYPE)
        self.fc2 = nn.Linear(500, 10, dtype=DTYPE)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        x = F.max_pool2d(x, 2, 2)
        x = F.relu(self.conv2(x))
        x = F.max_pool2d(x, 2, 2)
        x = x.reshape(-1, 7 * 7 * 50)
        x = F.relu(self.fc1(x))
        return self.fc2(x)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--network", choices=["mlp", "conv"], default="conv")
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--test-batch-size", type=int, default=1024)
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--no-cuda", action="store_true", default=False)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--data", type=str, default="./examples/data/MNIST/raw")
    parser.add_argument("--synthetic", action="store_true",
                        help="force the synthetic dataset")
    args = parser.parse_args(argv)

    np.random.seed(args.seed)
    pdn.manual_seed(args.seed)

    device = ("cuda:{}".format(pdn.cuda.device_count() - 1)
              if pdn.cuda.is_available() and not args.no_cuda else "cpu")

    net = {"mlp": MLP(), "conv": ConvNet()}[args.network].to(device)
    print(net)
    optimizer = Adam(net.parameters(), lr=args.lr)

    dataset = MNISTDataset(args.data)
    if dataset.available() and not args.synthetic:
        (train_x, train_y) = dataset.load("train")
        (test_x, test_y) = dataset.load("test")
        train_x = train_x.astype(DTYPE)
        test_x = test_x.astype(DTYPE)
    else:
        print("MNIST files not found -> synthetic MNIST-shaped data")
        (train_x, train_y), (test_x, test_y) = synthetic_mnist()
        train_x = train_x.astype(DTYPE)
        test_x = test_x.astype(DTYPE)

    train_loader = data_loader(train_x, train_y, args.batch_size,
                               shuffle=True)
    test_loader = data_loader(test_x, test_y, args.test_batch_size)

    def train_step(bx, by):
        loss = F.cross_entropy_loss(net(bx), by)
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        return loss

    def eval_step(bx):
        return net(bx).argmax(-1)

    jtrain = pdn.jit(train_step, state=(net, optimizer))
    jeval = pdn.jit(eval_step, state=(net,))

    dev = pdn.Device(device)
    # accelerator: keep the epoch data device-resident and fuse the whole
    # sweep into ONE lax.scan program (jstep.foreach) — per-batch uploads
    # and dispatches through the remote tunnel otherwise dominate
    on_device = dev.kind == "accel"
    B = args.batch_size
    if on_device:
        with pdn.no_grad():
            Xd = pdn.Tensor(train_x, device=dev)
            yd = pdn.Tensor(train_y, device=dev)
        n_full = (len(train_x) // B) * B
    for epoch in range(args.epochs):
        net.train()
        t0 = time.time()
        if on_device:
            with pdn.no_grad():
                perm = pdn.Tensor(np.random.permutation(len(train_x)),
                                  device=dev)
                Xp, yp = Xd[perm], yd[perm]
                Xb = Xp[:n_full].reshape((n_full // B, B) + train_x.shape[1:])
                yb = yp[:n_full].reshape(n_full // B, B)
            if n_full:
                losses = jtrain.foreach(Xb, yb)
                loss = losses[-1]

            n_steps = n_full // B
            if n_full < len(train_x):
                loss = jtrain(Xp[n_full:], yp[n_full:])
                n_steps += 1
            loss.item()  # sync: the epoch really finished
        else:
            n_steps = 0
            for batch_x, batch_y in train_loader:
                loss = jtrain(pdn.Tensor(batch_x, device=dev),
                              pdn.Tensor(batch_y, device=dev))
                n_steps += 1
        train_time = time.time() - t0

        net.eval()
        right, size = 0, 0
        with pdn.no_grad():
            for batch_x, batch_y in test_loader:
                pred = jeval(pdn.Tensor(batch_x, device=dev))
                right += int((pred.numpy() == batch_y).sum())
                size += len(batch_y)
        print("epoch {:2d}: loss={:.6f} test_acc={:.4f} "
              "({:.2f}s/epoch, {:.1f} steps/s)".format(
                  epoch, loss.item(), right / size, train_time,
                  n_steps / train_time))
    return right / size


DTYPE = np.float32

if __name__ == "__main__":
    main()

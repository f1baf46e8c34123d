"""1-D gradient descent via autograd (parity with the reference's
examples/pydynet/autograd1d.py): minimize f(x) = log((x-7)^2 + 6) both by
``Tensor.backward()`` and by hand, and compare trajectories."""
import numpy as np

import pydynet_tpu as pdn

device = ("cuda:{}".format(pdn.cuda.device_count() - 1)
          if pdn.cuda.is_available() else "cpu")


def auto_grad(x0: float, lr: float, n_iter: int):
    xs = [x0]
    x = pdn.Tensor(float(x0), requires_grad=True, device=device)
    for _ in range(n_iter):
        x.zero_grad()
        y = pdn.log((x - 7) ** 2 + 6)
        y.backward()
        with x.device:
            x.data -= lr * x.grad
        xs.append(x.item())
    return xs


def manual_grad(x: float, lr: float, n_iter: int):
    xs = [x]
    for _ in range(n_iter):
        x -= lr * 2 * (x - 7) / ((x - 7) ** 2 + 6)
        xs.append(x)
    return xs


def main():
    x1 = np.array(auto_grad(1.0, 1.5, 20))
    x2 = np.array(manual_grad(1.0, 1.5, 20))
    err = np.abs(x1 - x2).max()
    print("autograd trajectory :", np.round(x1[-5:], 5))
    print("manual trajectory   :", np.round(x2[-5:], 5))
    print(f"max |auto - manual| = {err:.2e}")
    assert err < 1e-6

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        xg = np.linspace(0, 10, 101)
        plt.figure(figsize=(6, 3))
        plt.plot(xg, np.log((xg - 7) ** 2 + 6), lw=0.7)
        plt.scatter(x1, np.log((x1 - 7) ** 2 + 6), color="red", marker="^")
        plt.title("Gradient descent by AutoGrad")
        plt.savefig("/tmp/ad1d.png")
        print("saved /tmp/ad1d.png")
    except ImportError:
        pass
    return err


if __name__ == "__main__":
    main()

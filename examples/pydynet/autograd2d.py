"""2-D gradient descent via autograd (parity with the reference's
examples/pydynet/autograd2d.py): minimize the convex bowl
f(x, y) = (x-3)^2 + 2(y+1)^2 with a jit-compiled update step."""
import numpy as np

import pydynet_tpu as pdn

device = "cuda:0" if pdn.cuda.is_available() else "cpu"


def main(n_iter: int = 60, lr: float = 0.1):
    w = pdn.Tensor(np.array([-4.0, 4.0]), requires_grad=True, device=device)
    target = pdn.Tensor(np.array([3.0, -1.0]), device=device)
    coef = pdn.Tensor(np.array([1.0, 2.0]), device=device)

    def step():
        w.zero_grad()
        loss = (coef * (w - target) ** 2).sum()
        loss.backward()
        w.data -= lr * w.grad
        return loss

    jstep = pdn.jit(step, state=[w])
    trajectory = [w.numpy().copy()]
    for _ in range(n_iter):
        loss = jstep()
        trajectory.append(w.numpy().copy())

    print("final point:", np.round(w.numpy(), 5), "loss:",
          float(loss.item()))
    assert np.allclose(w.numpy(), [3.0, -1.0], atol=1e-3)
    return np.array(trajectory)


if __name__ == "__main__":
    main()

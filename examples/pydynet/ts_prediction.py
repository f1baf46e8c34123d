"""GRU time-series prediction (parity with the reference's
examples/pydynet/ts_prediction.py): windowized sin/cos signal, GRU + linear
head, full-batch Adam training — the whole train step is one compiled XLA
program with the recurrence as a lax.scan."""
import numpy as np

import pydynet_tpu as pdn
from pydynet_tpu import Tensor, nn
from pydynet_tpu.optim import Adam

TIME_STEP = 40
INPUT_SIZE = 1
H_SIZE = 32
EPOCHS = 50


def windowize(y, input_len, horizon=1, stride=1, step=1):
    y = np.asarray(y)
    max_i = len(y) - (input_len + horizon) * step + step
    idx_inputs, idx_targets = [], []
    for i in range(0, max_i, stride):
        idx_inputs.append(i + np.arange(0, input_len * step, step))
        idx_targets.append(i + input_len * step +
                           np.arange(0, horizon * step, step))
    X = y[np.array(idx_inputs)]
    Y = y[np.array(idx_targets)]
    return (Tensor(X[..., np.newaxis], dtype=np.float32),
            Tensor(Y, dtype=np.float32))


def f(t):
    return np.sin(np.pi * t) + 0.5 * np.cos(2 * np.pi * t)


class RNN(nn.Module):

    def __init__(self):
        super().__init__()
        self.rnn = nn.GRU(input_size=INPUT_SIZE, hidden_size=H_SIZE,
                          num_layers=1, batch_first=True, dtype=np.float32)
        self.out = nn.Linear(H_SIZE, 1, dtype=np.float32)

    def forward(self, x, h_state=None):
        _, h_state = self.rnn(x, h_state)
        return self.out(h_state[:, self.rnn.num_layers - 1, :])


def train_test_split(X, y, test_size=0.2, seed=42):
    n = len(X)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    cut = int(n * (1 - test_size))
    tr, te = perm[:cut], perm[cut:]
    return X[tr.tolist()], X[te.tolist()], y[tr.tolist()], y[te.tolist()]


def main(epochs: int = EPOCHS):
    np.random.seed(0)
    steps = np.arange(0, 100, .05)
    X, Y = windowize(f(steps), input_len=TIME_STEP)
    X_train, X_test, Y_train, Y_test = train_test_split(X, Y)

    device = "cuda:0" if pdn.cuda.is_available() else "cpu"
    rnn = RNN().to(device)
    optimizer = Adam(rnn.parameters(), lr=0.01)
    criterion = nn.MSELoss()

    def train_step(bx, by):
        prediction = rnn(bx)
        loss = criterion(prediction, by)
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        return loss

    def eval_step(bx, by):
        return criterion(rnn(bx), by)

    jtrain = pdn.jit(train_step, state=(rnn, optimizer))
    jeval = pdn.jit(eval_step, state=(rnn,))

    X_train, Y_train = X_train.to(device), Y_train.to(device)
    X_test, Y_test = X_test.to(device), Y_test.to(device)

    first_loss = None
    for step in range(epochs):
        rnn.train()
        train_loss = jtrain(X_train, Y_train)
        if first_loss is None:
            first_loss = float(train_loss.item())
        rnn.eval()
        with pdn.no_grad():
            test_loss = jeval(X_test, Y_test)
        if step % 10 == 0 or step == epochs - 1:
            print(f"epoch {step:3d}: train={train_loss.item():.5f} "
                  f"test={test_loss.item():.5f}")

    final = float(test_loss.item())
    print(f"loss {first_loss:.4f} -> {final:.4f}")
    assert final < first_loss
    return final


if __name__ == "__main__":
    main()

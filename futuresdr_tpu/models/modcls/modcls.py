"""Modulation classification: synthetic dataset + small CNN.

Parity: ``examples/burn/src/{dataset.rs,model.rs,simple_cnn.rs}`` — the
reference trains a burn CNN on synthetic modulated IQ inside a flowgraph;
here the natural TPU form is flax/optax (the framework *is* the ML
stack), and inference drops into a flowgraph as an ``ApplyNM`` block over
128-sample frames.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CLASSES = ["bpsk", "qpsk", "qam16", "fm", "gfsk", "ook"]
FRAME = 128


def _symbols(kind: str, n: int, rng) -> np.ndarray:
    if kind == "bpsk":
        return (2 * rng.integers(0, 2, n) - 1).astype(np.complex64)
    if kind == "qpsk":
        pts = np.exp(1j * (np.pi / 4 + np.pi / 2 * np.arange(4)))
        return pts[rng.integers(0, 4, n)].astype(np.complex64)
    if kind == "qam16":
        lv = np.array([-3, -1, 1, 3]) / np.sqrt(10)
        return (
            lv[rng.integers(0, 4, n)] + 1j * lv[rng.integers(0, 4, n)]
        ).astype(np.complex64)
    if kind == "ook":
        return (rng.integers(0, 2, n) * np.sqrt(2.0)).astype(np.complex64)
    raise ValueError(kind)


def _gen_frame(kind: str, snr_db: float, rng) -> np.ndarray:
    sps = 4
    if kind == "fm":
        audio = rng.standard_normal(FRAME).astype(np.float32)
        audio = np.convolve(audio, np.ones(8) / 8, mode="same")
        phase = np.cumsum(audio) * 0.8
        x = np.exp(1j * phase).astype(np.complex64)
    elif kind == "gfsk":
        # Gaussian-filtered 2-FSK, h ≈ 0.5 (Bluetooth/keyfob family)
        bits = 2.0 * rng.integers(0, 2, FRAME // sps + 2) - 1.0
        dev = np.repeat(bits, sps)[:FRAME].astype(np.float32)
        g = np.exp(-0.5 * (np.arange(-4, 5) / 1.5) ** 2)
        dev = np.convolve(dev, g / g.sum(), mode="same")
        x = np.exp(1j * np.cumsum(0.5 * np.pi * dev / sps)).astype(
            np.complex64
        )
    else:
        syms = _symbols(kind, FRAME // sps + 4, rng)
        up = np.zeros(len(syms) * sps, np.complex64)
        up[::sps] = syms
        h = np.hamming(2 * sps).astype(np.float32)
        x = np.convolve(up, h, mode="same")[:FRAME]
        x /= np.sqrt(np.mean(np.abs(x) ** 2) + 1e-12)
    # random phase + small CFO
    cfo = rng.uniform(-0.01, 0.01)
    ph0 = rng.uniform(0, 2 * np.pi)
    x = x * np.exp(1j * (ph0 + 2 * np.pi * cfo * np.arange(FRAME)))
    npow = 10 ** (-snr_db / 10)
    x = x + np.sqrt(npow / 2) * (
        rng.standard_normal(FRAME) + 1j * rng.standard_normal(FRAME)
    )
    return x.astype(np.complex64)


def make_dataset(
    n_per_class: int, snr_db: Tuple[float, float] = (5.0, 20.0), seed: int = 0
):
    """Returns (x [N, 2, FRAME] float32, y [N] int32)."""
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for ci, kind in enumerate(CLASSES):
        for _ in range(n_per_class):
            snr = rng.uniform(*snr_db)
            f = _gen_frame(kind, snr, rng)
            xs.append(np.stack([f.real, f.imag]).astype(np.float32))
            ys.append(ci)
    x = np.stack(xs)
    y = np.asarray(ys, np.int32)
    order = rng.permutation(len(y))
    return x[order], y[order]


# ---------------------------------------------------------------------------
# model (flax)
# ---------------------------------------------------------------------------


def _net():
    import flax.linen as nn

    class Cnn(nn.Module):
        @nn.compact
        def __call__(self, x):  # [B, 2, FRAME]
            x = jnp.transpose(x, (0, 2, 1))  # [B, FRAME, 2]
            x = nn.Conv(32, (8,), strides=(2,))(x)
            x = nn.relu(x)
            x = nn.Conv(48, (8,), strides=(2,))(x)
            x = nn.relu(x)
            x = nn.Conv(64, (8,), strides=(2,))(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=1)
            x = nn.Dense(64)(x)
            x = nn.relu(x)
            return nn.Dense(len(CLASSES))(x)

    return Cnn()


@dataclass
class ModClassifier:
    """Train/infer wrapper (reference model.rs + train loop)."""

    seed: int = 0
    params: Optional[Dict] = field(default=None, repr=False)

    def init(self):
        net = _net()
        self.params = net.init(
            jax.random.PRNGKey(self.seed), jnp.zeros((1, 2, FRAME))
        )
        return self

    def train(
        self,
        x: np.ndarray,
        y: np.ndarray,
        epochs: int = 5,
        batch: int = 128,
        lr: float = 1e-3,
    ) -> float:
        import optax

        if self.params is None:
            self.init()
        net = _net()
        opt = optax.adam(lr)
        opt_state = opt.init(self.params)

        @jax.jit
        def step(params, opt_state, xb, yb):
            def loss_fn(p):
                logits = net.apply(p, xb)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, yb
                ).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        n = len(y)
        rng = np.random.default_rng(self.seed)
        loss = 0.0
        for _ in range(epochs):
            order = rng.permutation(n)
            for i in range(0, n - batch + 1, batch):
                idx = order[i : i + batch]
                self.params, opt_state, loss = step(
                    self.params, opt_state, jnp.asarray(x[idx]), jnp.asarray(y[idx])
                )
        return float(loss)

    def predict(self, x: np.ndarray) -> np.ndarray:
        net = _net()
        logits = net.apply(self.params, jnp.asarray(x))
        return np.asarray(jnp.argmax(logits, axis=-1))

    def accuracy(self, x: np.ndarray, y: np.ndarray) -> float:
        return float(np.mean(self.predict(x) == y))

    # ---- flowgraph integration (ApplyNM inference block) ---------------
    def as_block(self):
        """1 frame (128 c64) in → 1 class index (f32) out per frame."""
        from futuresdr_tpu.blocks import ApplyNM

        net = _net()
        params = self.params

        def fn(win):  # CArray [k, FRAME]
            xb = jnp.stack([win.re, win.im], axis=1)  # [k, 2, FRAME]
            logits = net.apply(params, xb)
            return jnp.argmax(logits, axis=-1).astype(jnp.float32)[:, None]

        return ApplyNM(fn, FRAME, 1, np.complex64, np.float32, name="ModCls")

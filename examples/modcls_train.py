"""Train the ML modulation classifier and run it in a flowgraph.

Parity: the reference's ``examples/burn`` (burn-framework CNN classifying
modulation from IQ frames, dataset at ``examples/burn/src/dataset.rs``).
Here the model is flax/optax, training runs on the default JAX device,
and inference drops into a flowgraph as an ordinary block.

Run:  python examples/modcls_train.py [--epochs 30] [--frames 800]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime, connect  # noqa: E402
from futuresdr_tpu.blocks import VectorSink, VectorSource  # noqa: E402
from futuresdr_tpu.models.modcls import (  # noqa: E402
    CLASSES,
    ModClassifier,
    make_dataset,
)
from futuresdr_tpu.models.modcls.modcls import FRAME, _gen_frame  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--frames", type=int, default=800)
    args = ap.parse_args()

    print(f"dataset: {args.frames} frames x {len(CLASSES)} classes {CLASSES}")
    xtr, ytr = make_dataset(args.frames, seed=0)
    xte, yte = make_dataset(max(100, args.frames // 5), seed=1)

    m = ModClassifier(seed=0).init()
    t0 = time.perf_counter()
    m.train(xtr, ytr, epochs=args.epochs, lr=2e-3)
    print(f"trained {args.epochs} epochs in {time.perf_counter() - t0:.1f}s")
    print(f"held-out accuracy: {m.accuracy(xte, yte):.3f}")

    # classify a live IQ stream through the runtime, one label per frame
    rng = np.random.default_rng(7)
    truth = rng.integers(0, len(CLASSES), 32)
    iq = np.concatenate(
        [np.asarray(_gen_frame(CLASSES[k], 18.0, rng)) for k in truth]
    ).astype(np.complex64)
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(fg, VectorSource(iq), m.as_block(), snk)
    Runtime(chunk_size=FRAME * 16).run(fg)
    pred = snk.data().astype(int)
    acc = float(np.mean(pred == truth))
    print(f"flowgraph stream: {len(pred)} frames, accuracy {acc:.3f}")
    for k, name in enumerate(CLASSES):
        n = int(np.sum(truth == k))
        ok = int(np.sum((truth == k) & (pred == k)))
        print(f"  {name:6s}: {ok}/{n}")


if __name__ == "__main__":
    main()

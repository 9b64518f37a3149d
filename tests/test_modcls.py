"""Modulation classification (parity: examples/burn ML integration)."""

import numpy as np

from futuresdr_tpu.models.modcls import CLASSES, ModClassifier, make_dataset


def _trained(seed=0):
    xtr, ytr = make_dataset(400, seed=seed)
    m = ModClassifier(seed=seed).init()
    m.train(xtr, ytr, epochs=20, lr=2e-3)
    return m


def test_classifier_learns():
    m = _trained()
    xte, yte = make_dataset(80, seed=1)
    acc = m.accuracy(xte, yte)
    assert acc > 0.85, f"accuracy {acc}"


def test_inference_block_in_flowgraph():
    from futuresdr_tpu import Flowgraph, Runtime, connect
    from futuresdr_tpu.blocks import VectorSink, VectorSource
    from futuresdr_tpu.models.modcls.modcls import FRAME, _gen_frame

    m = _trained(seed=2)
    rng = np.random.default_rng(3)
    # stream of 64 FM frames (the unambiguous class — this test exercises
    # the flowgraph plumbing, not the classifier margin)
    frames = [np.asarray(_gen_frame("fm", 15.0, rng)) for _ in range(64)]
    iq = np.concatenate(frames).astype(np.complex64)
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(fg, VectorSource(iq), m.as_block(), snk)
    Runtime(chunk_size=FRAME * 16).run(fg)
    pred = snk.data()
    assert len(pred) == 64
    fm = CLASSES.index("fm")
    assert np.mean(pred == fm) > 0.8

"""Mocker harness tests (parity: tests/mocker.rs:11-60 — split-call
continuity across runs, tag passthrough; book/src/mocker.md pattern)."""

import numpy as np

from futuresdr_tpu import Mocker
from futuresdr_tpu.blocks import Apply, Fir, MovingAvg, SignalSource
from futuresdr_tpu.runtime.tags import ItemTag, Tag


def test_mocker_apply():
    m = Mocker(Apply(lambda x: x * 3.0, np.float32))
    m.input(0, np.arange(100, dtype=np.float32))
    m.run()
    assert np.allclose(m.output(0), np.arange(100) * 3.0)


def test_mocker_split_call_continuity():
    # state carries across run() calls: two runs == one run on the concat
    rng = np.random.default_rng(0)
    taps = rng.standard_normal(16).astype(np.float32)
    x = rng.standard_normal(2048).astype(np.float32)

    m = Mocker(Fir(taps, dtype=np.float32))
    m.input(0, x[:1024])
    m.run()
    m.input(0, x[1024:])
    m.run()
    two_calls = m.output(0)

    m2 = Mocker(Fir(taps, dtype=np.float32))
    m2.input(0, x)
    m2.run()
    one_call = m2.output(0)

    assert np.allclose(two_calls, one_call, atol=1e-4)


def test_mocker_tag_passthrough():
    m = Mocker(Apply(lambda x: x, np.float32))
    tags = [ItemTag(3, Tag.string("a")), ItemTag(50, Tag.id(9))]
    m.input(0, np.zeros(64, np.float32), tags=tags)
    m.run()
    m.input(0, np.zeros(64, np.float32), tags=[ItemTag(0, Tag.id(1))])
    m.run()
    got = m.output_tags(0)
    assert [(t.index, t.tag.kind.value) for t in got] == [
        (3, "String"),
        (50, "Id"),
        (64, "Id"),
    ]


def test_mocker_message_handler():
    src = SignalSource(1000.0, 48000.0)
    m = Mocker(src)
    reply = m.post("freq", 2000.0)
    assert reply is not None


def test_mocker_moving_avg_state():
    m = Mocker(MovingAvg(4, np.float32))
    m.input(0, np.ones(8, np.float32))
    m.run()
    y = m.output(0)
    # zero-history start: ramp up over width, then steady 1.0
    assert np.allclose(y, [0.25, 0.5, 0.75, 1, 1, 1, 1, 1])

"""Keyfob OOK receiver (parity: examples/keyfob decoder.rs)."""

import numpy as np
import pytest

from futuresdr_tpu.models.keyfob import (
    COMMANDS,
    PREAMBLE,
    KeyfobReceiver,
    synthesize,
)


@pytest.mark.parametrize("suffix,name", list(COMMANDS.items()))
def test_commands_decode(suffix, name):
    payload = "01100110"
    bits = "0110" + PREAMBLE + payload + suffix
    sig = synthesize(bits)
    rng = np.random.default_rng(1)
    sig = sig + 0.05 * (
        rng.standard_normal(len(sig)) + 1j * rng.standard_normal(len(sig))
    ).astype(np.complex64)
    frames = KeyfobReceiver().process(sig)
    assert len(frames) == 1
    assert frames[0].command == name
    assert frames[0].bits == PREAMBLE + payload + suffix


def test_no_preamble_no_frame():
    sig = synthesize("0011001100110011")
    frames = KeyfobReceiver().process(sig)
    assert frames == []

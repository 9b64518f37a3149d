"""Impairment matrix for the small modems (r4 verdict weak #4): CFO +
sample-clock offset + level mismatch for M17, keyfob and rattlegram-phy,
mirroring the WLAN CFO/noise loopback (tests/test_wlan.py).

Levels are justified from each protocol's physics (measured operating
edges in NOTES "Round-5 impairment matrix"):

* M17 (4FSK, 800 Hz inner deviation): CFO appears at the discriminator
  as a DC symbol offset — the preamble-mean estimator cancels it up to
  ~±1 symbol unit; tests pin ±400 Hz (the reference's symbol_sync has
  NO CFO estimation at all — its Gardner loop is timing-only). SCO to
  1000 ppm (per-frame sync re-anchors the grid); level 0.05–20×
  (LS sync gain).
* Keyfob (Manchester OOK): envelope detection is CFO-immune by
  construction (tested at +60 kHz on a 250 kS/s stream); the
  decoder.rs half/full-bit windows (63–83 / 131–161 samples) tolerate
  ~±10% clock offset; the threshold is adaptive (0.5·max) so level is
  free over 0.02–30×.
* Rattlegram (DQPSK-OFDM audio): a sample-clock slip of δ per symbol
  rotates carrier k's differential by 2π·k·δ/N — the top payload
  carrier crosses the π/4 decision boundary near ~150 ppm, which is
  where the REFERENCE decoder (no drift handling, decoder.rs:385) dies.
  The joint δ-hypothesis search in phy._demod extends this to ±700 ppm
  (sound cards differ by ~±200); level is free (differential).
"""

import numpy as np
import pytest

from futuresdr_tpu.models import keyfob as K
from futuresdr_tpu.models.m17 import phy as M
from futuresdr_tpu.models.rattlegram import phy as R


def _resample(x, ratio):
    """Linear-interpolation resample by ``ratio`` — a sample-clock
    offset of (ratio−1)."""
    n = len(x)
    t = np.arange(int(n / ratio) - 2) * ratio
    i0 = t.astype(int)
    fr = (t - i0).astype(np.float32)
    return (x[i0] * (1 - fr) + x[i0 + 1] * fr).astype(x.dtype)


def _cfo(x, df_hz, fs):
    k = np.arange(len(x))
    return (x * np.exp(2j * np.pi * df_hz * k / fs)).astype(np.complex64)


# ---------------------------------------------------------------------------
# M17
# ---------------------------------------------------------------------------


def _m17_tx():
    lsf = M.make_lsf("AB1CDE", "FG2HIJ")
    return M.modulate_transmission(
        lsf, [b"hello m17 payload one...", b"another payload frame..."]
    )


def _m17_ok(x):
    frames = M.M17Receiver().process(x)
    return len(frames) == 2 and all(f.lsf_crc_ok for f in frames)


@pytest.mark.parametrize("df", [-400.0, -100.0, 100.0, 400.0])
def test_m17_cfo(df):
    assert _m17_ok(_cfo(_m17_tx(), df, M.FS))


@pytest.mark.parametrize("ppm", [-1000, 1000])
def test_m17_sample_clock_offset(ppm):
    assert _m17_ok(_resample(_m17_tx(), 1 + ppm * 1e-6))


@pytest.mark.parametrize("amp", [0.05, 20.0])
def test_m17_level_mismatch(amp):
    assert _m17_ok((_m17_tx() * amp).astype(np.complex64))


def test_m17_combined():
    x = _resample(_cfo(_m17_tx(), 200.0, M.FS), 1.0005)
    assert _m17_ok((x * 0.2).astype(np.complex64))


# ---------------------------------------------------------------------------
# Keyfob
# ---------------------------------------------------------------------------


def _keyfob_sig(seed=1):
    bits = "0110" + K.PREAMBLE + "01100110" + "11100011"  # Open
    s = K.synthesize(bits)
    rng = np.random.default_rng(seed)
    return s + 0.05 * (
        rng.standard_normal(len(s)) + 1j * rng.standard_normal(len(s))
    ).astype(np.complex64)


def _keyfob_ok(x):
    frames = K.KeyfobReceiver().process(x)
    return [f.command for f in frames] == ["Open"]


@pytest.mark.parametrize("df", [-60000.0, 25000.0, 60000.0])
def test_keyfob_cfo_immune(df):
    assert _keyfob_ok(_cfo(_keyfob_sig(), df, K.RATE))


@pytest.mark.parametrize("ppm", [-80000, 80000])
def test_keyfob_clock_offset(ppm):
    assert _keyfob_ok(_resample(_keyfob_sig(), 1 + ppm * 1e-6))


@pytest.mark.parametrize("amp", [0.02, 30.0])
def test_keyfob_level_mismatch(amp):
    assert _keyfob_ok((_keyfob_sig() * amp).astype(np.complex64))


# ---------------------------------------------------------------------------
# Rattlegram
# ---------------------------------------------------------------------------

_RG_PAYLOAD = b"rattlegram impairment run"


def _rg_sig(seed=2):
    audio = R.encode_frame(_RG_PAYLOAD)
    rng = np.random.default_rng(seed)
    s = np.concatenate(
        [np.zeros(4321, np.float32), audio, np.zeros(2000, np.float32)]
    )
    return (s + 0.02 * rng.standard_normal(len(s))).astype(np.float32)


def _rg_ok(x):
    frames = R.RattlegramReceiver().process(x)
    return [
        (f.crc_ok, f.payload == _RG_PAYLOAD) for f in frames
    ] == [(True, True)]


@pytest.mark.parametrize("ppm", [-700, -300, 300, 700])
def test_rattlegram_clock_offset(ppm):
    assert _rg_ok(_resample(_rg_sig(), 1 + ppm * 1e-6))


@pytest.mark.parametrize("amp", [0.05, 10.0])
def test_rattlegram_level_mismatch(amp):
    assert _rg_ok((_rg_sig() * amp).astype(np.float32))


def test_rattlegram_combined():
    assert _rg_ok(
        (_resample(_rg_sig(), 1.0005) * 0.1).astype(np.float32)
    )

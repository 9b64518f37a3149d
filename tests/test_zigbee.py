"""ZigBee / IEEE 802.15.4 modem tests (parity: examples/zigbee chain)."""

import numpy as np

from futuresdr_tpu.models.zigbee import (
    ZigbeeReceiver,
    make_phy_frame,
    modulate,
)
from futuresdr_tpu.models.zigbee.zigbee import (
    chip_table,
    crc16_154,
    demod_templates,
)


def _noisy(sig, power, seed=0):
    rng = np.random.default_rng(seed)
    return (
        sig
        + np.sqrt(power / 2)
        * (
            rng.standard_normal(len(sig)) + 1j * rng.standard_normal(len(sig))
        ).astype(np.complex64)
    )


def test_chip_table_properties():
    t = chip_table()
    assert t.shape == (16, 32)
    # 802.15.4 sequences are cyclic shifts within each half
    for s in range(1, 8):
        assert np.array_equal(t[s], np.roll(t[0], -4 * s))
    # demod-template separation: symbols s and s+8 are exact antipodes
    # (I chips inverted ⇒ negated phase derivative) — signed argmax
    # disambiguates them; every other pair is well separated
    tm = demod_templates()
    g = tm @ tm.T
    for s in range(8):
        assert g[s, s + 8] < -0.99
    off = g - np.diag(np.diag(g))
    for s in range(8):
        off[s, s + 8] = off[s + 8, s] = 0.0
    assert np.max(off) < 0.75


def test_crc16_known_value():
    # CRC-16/CCITT (Kermit, LSB-first): "123456789" → 0x2189
    assert crc16_154(b"123456789") == 0x2189


def test_loopback_clean():
    payload = b"zigbee payload 123"
    sig = modulate(make_phy_frame(payload), pad=80)
    frames = ZigbeeReceiver().process(sig)
    assert len(frames) == 1
    assert frames[0].crc_ok
    assert frames[0].payload == payload


def test_loopback_noisy():
    payload = b"noisy 802.15.4 frame payload!"
    sig = _noisy(modulate(make_phy_frame(payload), pad=100), 0.02, seed=1)
    frames = ZigbeeReceiver().process(sig)
    assert len(frames) == 1
    assert frames[0].crc_ok
    assert frames[0].payload == payload


def test_corruption_flagged():
    payload = b"damage me"
    sig = modulate(make_phy_frame(payload), pad=100)
    # stomp on the payload chips region
    sig[100 + 64 * 14 : 100 + 64 * 16] = 0.0
    frames = ZigbeeReceiver().process(sig)
    if frames:
        assert not frames[0].crc_ok or frames[0].payload != payload


# ---------------------------------------------------------------------------
# In-graph clock recovery path (reference-parity chain:
# demod → ClockRecoveryMm → chip correlation, zigbee/src/main.rs)
# ---------------------------------------------------------------------------


def _resample_sro(sig, ratio):
    """Nearest/linear resample simulating a sample-rate offset."""
    n = int(len(sig) / ratio)
    pos = np.arange(n) * ratio
    i0 = np.clip(pos.astype(int), 0, len(sig) - 2)
    fr = (pos - i0).astype(np.float32)
    return ((1 - fr) * sig[i0] + fr * sig[i0 + 1]).astype(np.complex64)


def test_in_graph_mm_rx_flowgraph():
    from futuresdr_tpu import Runtime
    from futuresdr_tpu.blocks import VectorSource
    from futuresdr_tpu.models.zigbee.zigbee import make_mm_rx_flowgraph

    payload = b"in-graph clock recovery!"
    sig = _noisy(modulate(make_phy_frame(payload), pad=256), 0.02, seed=3)
    sig = np.concatenate([sig, np.zeros(4096, np.complex64)])
    fg, sink = make_mm_rx_flowgraph(
        VectorSource(sig.astype(np.complex64)), process_size=4096
    )
    Runtime(chunk_size=8192).run(fg)
    ok = [f for f in sink.frames if f.crc_ok]
    assert len(ok) >= 1
    assert ok[0].payload == payload


def test_mm_rx_tracks_sro():
    """0.5% sample-rate offset: the MM loop tracks it (the fixed-grid
    template receiver is specified only for fractional-sample offsets)."""
    from futuresdr_tpu.models.zigbee.zigbee import ZigbeeChipReceiver
    from futuresdr_tpu.ops import cplx as _c
    from futuresdr_tpu.ops.mm import mm_init, mm_process

    payload = b"sro tracked by MM feedback loop" * 2
    sig = modulate(make_phy_frame(payload), pad=256)
    sig = _resample_sro(sig, 1.005)
    d = np.angle(sig[1:] * np.conj(sig[:-1])).astype(np.float32)
    st = mm_init(2.0)
    st, out, valid = mm_process(
        st, d, n_out=len(d), look_ahead=3, omega_mid=2.0,
        omega_limit=0.02, gain_omega=0.0002, gain_mu=0.05,
    )
    chips = np.asarray(out)[np.asarray(valid)]
    frames = ZigbeeChipReceiver().process(chips)
    ok = [f for f in frames if f.crc_ok]
    assert len(ok) == 1 and ok[0].payload == payload


def test_multi_frame_capture():
    """The batched receiver decodes every PPDU in a dense capture."""
    parts = []
    payloads = []
    for i in range(6):
        p = bytes(f"multi frame {i:02d}!".encode())
        payloads.append(p)
        parts.append(modulate(make_phy_frame(p), pad=100))
    sig = np.concatenate(parts)
    frames = ZigbeeReceiver().process(sig)
    assert [f.payload for f in frames] == payloads
    assert all(f.crc_ok for f in frames)


def test_device_resident_ingest():
    from futuresdr_tpu.ops import cplx

    p = b"resident zigbee frame"
    sig = modulate(make_phy_frame(p), pad=80)
    bucket = -(-len(sig) // 16384) * 16384
    x = np.concatenate([sig, np.zeros(bucket - len(sig), np.complex64)])
    frames = ZigbeeReceiver().process(cplx.from_numpy(x))
    assert len(frames) == 1 and frames[0].payload == p and frames[0].crc_ok


def test_zigbee_process_stream_matches_process():
    from futuresdr_tpu.models.zigbee.zigbee import (
        ZigbeeReceiver,
        make_phy_frame,
        modulate,
    )

    rng = np.random.default_rng(6)
    parts = []
    for i in range(5):
        parts.append(
            modulate(make_phy_frame(bytes([i]) * 12), pad=800)
        )
    sig = np.concatenate(parts).astype(np.complex64)
    sig += 0.01 * (
        rng.standard_normal(len(sig)) + 1j * rng.standard_normal(len(sig))
    ).astype(np.complex64)
    chunks = [sig, sig, sig]

    ref = ZigbeeReceiver()
    want = [[(f.start, f.payload) for f in ref.process(c)] for c in chunks]
    rx = ZigbeeReceiver()
    got = [
        [(f.start, f.payload) for f in out]
        for out in rx.process_stream(chunks)
    ]
    assert got == want and all(len(w) == 5 for w in want)

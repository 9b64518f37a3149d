"""ADS-B / Mode S receiver tests (parity: examples/adsb chain)."""

import numpy as np

from futuresdr_tpu.models.adsb import (
    AdsbReceiver,
    encode_df17,
    synthesize_frame,
)
from futuresdr_tpu.models.adsb.adsb import (
    _crc_remainder,
    callsign_me,
)


def _noise(sig, power, seed=0):
    rng = np.random.default_rng(seed)
    return (
        sig
        + np.sqrt(power / 2)
        * (
            rng.standard_normal(len(sig)) + 1j * rng.standard_normal(len(sig))
        ).astype(np.complex64)
    )


def test_crc_construction():
    bits = encode_df17(0xABCDEF, callsign_me("TEST123"))
    assert _crc_remainder(bits) == 0
    bits2 = bits.copy()
    bits2[50] ^= 1
    assert _crc_remainder(bits2) != 0


def test_identification_frame():
    bits = encode_df17(0x4840D6, callsign_me("KLM1023"))
    sig = _noise(synthesize_frame(bits, pad=500), 0.005)
    rx = AdsbReceiver()
    frames = rx.process(sig)
    assert len(frames) == 1
    f = frames[0]
    assert f.df == 17
    assert f.icao == 0x4840D6
    assert f.crc_passed
    assert f.callsign == "KLM1023"
    assert rx.n_crc_ok == 1


def test_altitude_frame():
    # TC=11 airborne position, altitude 38000 ft with Q=1:
    # n = (38000+1000)/25 = 1560
    me = np.zeros(56, dtype=np.uint8)
    me[:5] = [(11 >> (4 - i)) & 1 for i in range(5)]
    n = 1560
    v = [(n >> (10 - i)) & 1 for i in range(11)]
    alt12 = v[:7] + [1] + v[7:]
    me[8:20] = alt12
    bits = encode_df17(0x123456, me)
    sig = _noise(synthesize_frame(bits, pad=300), 0.002, seed=1)
    frames = AdsbReceiver().process(sig)
    assert len(frames) == 1
    assert frames[0].altitude_ft == 38000


def test_two_aircraft():
    b1 = encode_df17(0x111111, callsign_me("AAL100"))
    b2 = encode_df17(0x222222, callsign_me("DLH456"))
    s1 = synthesize_frame(b1, pad=200)
    s2 = synthesize_frame(b2, pad=200)
    sig = _noise(
        np.concatenate([s1, np.zeros(700, np.complex64), s2]), 0.003, seed=2
    )
    frames = AdsbReceiver().process(sig)
    assert [f.icao for f in frames] == [0x111111, 0x222222]
    assert [f.callsign for f in frames] == ["AAL100", "DLH456"]


def test_corrupted_frame_counted_not_forwarded():
    bits = encode_df17(0x4840D6, callsign_me("KLM1023"))
    sig = synthesize_frame(bits, pad=400)
    # kill a chunk of the data (after the preamble)
    sig[400 + 32 + 100 : 400 + 32 + 160] = 0.5  # constant → bit errors
    sig = _noise(sig, 0.002, seed=3)
    rx = AdsbReceiver()
    frames = rx.process(sig)
    assert frames == []
    assert rx.n_crc_fail >= 1


def test_crc_bit_flip_repair():
    """Mode S CRC-syndrome repair (beyond the reference decoder): one
    arbitrary flipped bit is always repairable; two flips repair when
    they sit among the low-confidence candidates."""
    import numpy as np

    from futuresdr_tpu.models.adsb.adsb import (
        callsign_me,
        encode_df17,
        try_repair,
    )

    clean = encode_df17(0xABCDEF, callsign_me("TEST123"))
    for flips in ([3], [40], [111], [40, 77]):
        bad = clean.copy()
        for i in flips:
            bad[i] ^= 1
        conf = np.ones(112)
        conf[flips] = 0.1
        fixed, n = try_repair(bad, conf)
        assert n == len(flips)
        assert np.array_equal(fixed, clean)
    # unrepairable (3 flips, none in candidates) fails loudly
    bad = clean.copy()
    bad[[5, 50, 95]] ^= 1
    _, n = try_repair(bad, np.ones(112))
    assert n == -1


def test_crc_two_bit_repair_with_decoy_candidates():
    """Regression: `a ^ b == r` parses as `a ^ (b == r)` — the two-bit
    search must compare the XORed syndromes, not fire on the first
    candidate pair. Decoy low-confidence bits rank ahead of the true
    flips here."""
    import numpy as np

    from futuresdr_tpu.models.adsb.adsb import (
        callsign_me,
        encode_df17,
        try_repair,
    )

    clean = encode_df17(0xABCDEF, callsign_me("TEST123"))
    bad = clean.copy()
    bad[[60, 98]] ^= 1
    conf = np.ones(112)
    conf[[10, 20, 60, 98, 30]] = [0.01, 0.02, 0.05, 0.06, 0.03]
    fixed, n = try_repair(bad, conf)
    assert n == 2
    assert np.array_equal(fixed, clean)


def test_device_resident_ingest():
    from futuresdr_tpu.ops import cplx

    bits = encode_df17(0x4840D6, callsign_me("KLM1023"))
    sig = _noise(synthesize_frame(bits, pad=500), 0.005)
    bucket = -(-len(sig) // 16384) * 16384
    x = np.concatenate([sig, np.zeros(bucket - len(sig), np.complex64)])
    frames = AdsbReceiver().process(cplx.from_numpy(x))
    assert len(frames) == 1 and frames[0].crc_passed
    assert frames[0].callsign == "KLM1023"


def test_dense_capture_batch():
    """Batch CRC + O(k) NMS path over many frames in one capture."""
    rng = np.random.default_rng(3)
    parts = []
    for i in range(40):
        b = encode_df17(0x400000 + i, callsign_me(f"AC{i:02d}A"))
        parts.append(synthesize_frame(b, pad=700))
    sig = np.concatenate(parts)
    sig = sig + (0.004 * rng.standard_normal(len(sig))).astype(np.float32)
    rx = AdsbReceiver()
    frames = rx.process(sig)
    assert rx.n_crc_ok == 40
    assert sorted(f.icao for f in frames) == [0x400000 + i for i in range(40)]


def test_adsb_process_stream_matches_process():
    """Pipelined chunk stream yields exactly what per-chunk process()
    produces, in order."""
    rng = np.random.default_rng(5)
    parts = []
    for i in range(6):
        parts.append(
            synthesize_frame(
                encode_df17(0xABC000 + i, callsign_me(f"TES{i}")), pad=3000
            )
        )
    sig = np.concatenate(parts).astype(np.complex64)
    sig += 0.01 * (
        rng.standard_normal(len(sig)) + 1j * rng.standard_normal(len(sig))
    ).astype(np.complex64)
    chunks = [sig, sig, sig]

    ref = AdsbReceiver()
    want = [[(f.start, f.bits.tobytes()) for f in ref.process(c)] for c in chunks]
    rx = AdsbReceiver()
    got = [
        [(f.start, f.bits.tobytes()) for f in out]
        for out in rx.process_stream(chunks)
    ]
    assert got == want and all(len(w) == 6 for w in want)

"""StreamingReceiver adoption: process_stream == per-chunk process for
every modem family (VERDICT r3 #4 — the reference's actor runtime streams
every receiver by construction, wrapped_kernel.rs:60-232).

Each test builds a multi-chunk capture with that family's TX, decodes it
chunk-by-chunk via ``process`` on a fresh receiver, then via
``process_stream`` on another fresh receiver, and asserts the per-chunk
frame payloads/flags are identical."""

import numpy as np
import pytest


def _assert_stream_equals_process(make_rx, chunks, key):
    rx_a = make_rx()
    per_chunk_a = [key(rx_a.process(c)) for c in chunks]
    rx_b = make_rx()
    per_chunk_b = [key(out) for out in rx_b.process_stream(iter(chunks))]
    assert per_chunk_a == per_chunk_b
    assert any(per_chunk_a), "capture decoded nothing — test is vacuous"
    return per_chunk_a


def test_lora_stream_equals_process():
    from futuresdr_tpu.models.lora import LoraConfig, modulate_frame
    from futuresdr_tpu.models.lora.phy import LoraReceiver

    cfg = LoraConfig(sf=7, cr=1)
    chunks = []
    for i in range(3):
        iq = modulate_frame(cfg, f"lora stream chunk {i}".encode())
        chunks.append(
            np.concatenate(
                [
                    np.zeros(3 * cfg.n + 11 * i, np.complex64),
                    iq,
                    np.zeros(5 * cfg.n, np.complex64),
                ]
            )
        )
    got = _assert_stream_equals_process(
        lambda: LoraReceiver(cfg),
        chunks,
        key=lambda fs: [(f.payload, f.crc_ok) for f in fs],
    )
    assert got[1] == [(b"lora stream chunk 1", True)]


def test_m17_stream_equals_process():
    from futuresdr_tpu.models.m17 import (
        M17Receiver,
        make_lsf,
        modulate_transmission,
    )

    lsf = make_lsf("TPU-1", "N0CALL")
    chunks = [
        modulate_transmission(lsf, [f"m17 stream chunk {i}!!".encode()])
        for i in range(3)
    ]
    got = _assert_stream_equals_process(
        M17Receiver,
        chunks,
        key=lambda fs: [(f.payload[:16], f.dst, f.lsf_crc_ok) for f in fs],
    )
    assert got[0][0][1] == "TPU-1"


def test_keyfob_stream_equals_process():
    from futuresdr_tpu.models.keyfob import (
        COMMANDS,
        PREAMBLE,
        KeyfobReceiver,
        synthesize,
    )

    suffixes = list(COMMANDS)
    chunks = [
        synthesize("0110" + PREAMBLE + "01100110" + suffixes[0]),
        synthesize("0110" + PREAMBLE + "10011001" + suffixes[1]),
        np.zeros(20000, np.complex64),  # silent chunk: empty frame list
    ]
    _assert_stream_equals_process(
        KeyfobReceiver,
        chunks,
        key=lambda fs: [f.bits for f in fs],
    )


def test_rattlegram_stream_equals_process():
    from futuresdr_tpu.models.rattlegram.phy import (
        RattlegramReceiver,
        encode_frame,
    )

    chunks = [
        np.concatenate(
            [
                np.zeros(1000 + 313 * i, np.float32),
                encode_frame(f"rattlegram stream chunk {i}".encode()),
                np.zeros(4000, np.float32),
            ]
        )
        for i in range(2)
    ]
    got = _assert_stream_equals_process(
        RattlegramReceiver,
        chunks,
        key=lambda fs: [(f.payload, f.crc_ok) for f in fs],
    )
    assert got[0] == [(b"rattlegram stream chunk 0", True)]


def test_rattlegram_exact_stream_equals_process():
    from futuresdr_tpu.models.rattlegram.exact import (
        ExactDecoder,
        encode_exact,
    )

    chunks = [
        np.concatenate(
            [
                np.zeros(500 + 777 * i, np.float32),
                encode_exact(
                    f"exact stream chunk {i}".encode(), b"W1AW", 1600
                ),
                np.zeros(2000, np.float32),
            ]
        )
        for i in range(2)
    ]
    got = _assert_stream_equals_process(
        lambda: ExactDecoder(),
        chunks,
        key=lambda fs: [(f.payload, f.crc_ok) for f in fs],
    )
    assert got[1] == [(b"exact stream chunk 1", True)]


@pytest.mark.parametrize("family", ["adsb", "zigbee"])
def test_existing_streamers_still_equal(family):
    """ADS-B/ZigBee moved onto the shared base — pin equality there too."""
    if family == "adsb":
        from futuresdr_tpu.models.adsb import (
            AdsbReceiver,
            encode_df17,
            synthesize_frame,
        )
        from futuresdr_tpu.models.adsb.adsb import callsign_me

        chunks = [
            np.concatenate(
                [
                    synthesize_frame(
                        encode_df17(0x4840D6 + i * 7 + j, callsign_me("KLM1023")),
                        pad=400,
                    )
                    for j in range(3)
                ]
            )
            for i in range(2)
        ]
        _assert_stream_equals_process(
            AdsbReceiver,
            chunks,
            key=lambda fs: [(f.icao, f.crc_passed) for f in fs],
        )
    else:
        from futuresdr_tpu.models.zigbee import (
            ZigbeeReceiver,
            make_phy_frame,
            modulate,
        )

        chunks = [
            modulate(make_phy_frame(bytes([i]) * 10), pad=100)
            for i in range(2)
        ]
        _assert_stream_equals_process(
            ZigbeeReceiver,
            chunks,
            key=lambda fs: [(f.payload, f.crc_ok) for f in fs],
        )


@pytest.mark.parametrize("depth", [2, 3, 7])
def test_stream_depth_equals_process(depth):
    """Deeper pipeline queues (depth>1) keep per-chunk results exactly
    equal and in order, including when depth exceeds the chunk count."""
    from futuresdr_tpu.models.keyfob import KeyfobReceiver, synthesize

    chunks = [
        synthesize(
            "0110" + "10101111" + "01100110" + "11010101",
            pad=1500 + 37 * i,
        )
        for i in range(4)
    ]
    rx_a = KeyfobReceiver()
    ref = [[f.bits for f in rx_a.process(c)] for c in chunks]
    rx_b = KeyfobReceiver()
    got = [
        [f.bits for f in out]
        for out in rx_b.process_stream(iter(chunks), depth=depth)
    ]
    assert got == ref
    assert any(ref)
    with pytest.raises(ValueError):
        list(rx_b.process_stream(iter(chunks), depth=0))


def test_wlan_stream_depth_equals_process():
    """WlanReceiver's own pipelined stream honors the shared depth
    contract: deeper queues keep per-chunk results identical."""
    from futuresdr_tpu.models.wlan import (
        WlanReceiver,
        encode_frame,
        make_mac_frame,
    )

    chunks = []
    for i in range(4):
        psdu = make_mac_frame(f"wlan depth chunk {i}".encode(), seq=i)
        iq = encode_frame(psdu, "qpsk12", scrambler_seed=3 + i)
        chunks.append(
            np.concatenate(
                [np.zeros(600 + 31 * i, np.complex64), iq,
                 np.zeros(1200, np.complex64)]
            )
        )
    rx_a = WlanReceiver()
    ref = [[(f.psdu, f.crc_ok) for f in rx_a.process(c)] for c in chunks]
    rx_b = WlanReceiver()
    got = [
        [(f.psdu, f.crc_ok) for f in out]
        for out in rx_b.process_stream(iter(chunks), depth=3)
    ]
    assert got == ref
    assert any(ref)
    with pytest.raises(ValueError):
        rx_b.process_stream(iter(chunks), depth=0)

"""Aircraft tracker (tracker.rs parity): CPR pairing, velocity decode,
register lifecycle — driven over the air through the receiver."""

import numpy as np

from futuresdr_tpu.models.adsb.adsb import (
    AdsbReceiver,
    callsign_me,
    encode_df17,
    position_me,
    synthesize_frame,
    velocity_me,
)
from futuresdr_tpu.models.adsb.tracker import (
    Tracker,
    cpr_decode_global,
    cpr_encode,
    nl,
)


def test_cpr_roundtrip_handbook_position():
    lat, lon = 52.2572, 3.91937  # the classic Mode S handbook example
    even = cpr_encode(lat, lon, odd=False)
    odd = cpr_encode(lat, lon, odd=True)
    dec = cpr_decode_global(even, odd, newest_is_odd=True)
    assert dec is not None
    assert abs(dec[0] - lat) < 1e-3 and abs(dec[1] - lon) < 1e-3


def test_cpr_roundtrip_various_positions():
    rng = np.random.default_rng(0)
    for _ in range(20):
        lat = float(rng.uniform(-75, 75))
        lon = float(rng.uniform(-179, 179))
        dec = cpr_decode_global(
            cpr_encode(lat, lon, False),
            cpr_encode(lat, lon, True),
            newest_is_odd=False,
        )
        assert dec is not None
        assert abs(dec[0] - lat) < 1e-2 and abs(dec[1] - lon) < 1e-2


def test_nl_table_anchor_values():
    assert nl(0.0) == 59
    assert nl(87.5) == 1
    assert nl(52.2572) == 36  # handbook zone


def test_tracker_over_the_air():
    """ident + even/odd position + velocity frames through the RF
    receiver populate one aircraft record with a decoded position."""
    lat, lon = 48.35, 11.78
    icao = 0x3C6444
    frames_bits = [
        encode_df17(icao, callsign_me("DLH9TA")),
        encode_df17(
            icao, position_me(*cpr_encode(lat, lon, False), 37000, False)
        ),
        encode_df17(
            icao, position_me(*cpr_encode(lat, lon, True), 37000, True)
        ),
        encode_df17(icao, velocity_me(-120, 300, 640)),
    ]
    sig = np.concatenate(
        [synthesize_frame(b, amplitude=1.0, pad=300) for b in frames_bits]
    )
    rx = AdsbReceiver()
    decoded = rx.process(sig)
    tracker = Tracker()
    for f in decoded:
        tracker.update(f)
    assert icao in tracker.register
    rec = tracker.register[icao]
    assert rec.callsign == "DLH9TA"
    assert len(rec.positions) >= 1
    p = rec.positions[-1]
    assert abs(p["lat"] - lat) < 1e-2 and abs(p["lon"] - lon) < 1e-2
    assert p["altitude_ft"] == 37000
    assert len(rec.velocities) == 1
    v = rec.velocities[0]
    assert abs(v["ground_speed_kt"] - np.hypot(120, 300)) < 0.1
    assert v["vertical_rate_fpm"] == 640


def test_tracker_prune_and_cpr_window():
    t = [0.0]
    tracker = Tracker(cpr_window=5.0, clock=lambda: t[0])
    lat, lon = 10.0, 20.0
    f_even = encode_df17(
        0x111111, position_me(*cpr_encode(lat, lon, False), 10000, False)
    )
    f_odd = encode_df17(
        0x111111, position_me(*cpr_encode(lat, lon, True), 10000, True)
    )

    class _F:
        def __init__(self, bits):
            self.bits = bits
            self.df = 17
            self.icao = 0x111111
            self.crc_passed = True
            self.callsign = None

    tracker.update(_F(f_even))
    t[0] = 60.0  # odd frame arrives way outside the pairing window
    tracker.update(_F(f_odd))
    assert tracker.register[0x111111].positions == []
    t[0] = 62.0  # fresh even re-pairs with the recent odd
    tracker.update(_F(f_even))
    assert len(tracker.register[0x111111].positions) == 1
    t[0] = 1000.0
    assert tracker.prune(max_age=300.0) == 1
    assert tracker.register == {}


def test_cpr_zone_mismatch_rejected():
    """Frames from wildly different latitudes must return None, not a
    fabricated position (both can land in the polar NL=1 zone)."""
    e = cpr_encode(10.0, 20.0, False)
    o = cpr_encode(80.0, 20.0, True)
    assert cpr_decode_global(e, o, newest_is_odd=True) is None


def test_tracker_block_and_map_route():
    """Flowgraph → FramedReceiverSink(frames Pmt) → TrackerBlock message
    edge; the control port's ctrl_port call route replies
    Pmt::String(register JSON) in the exact shape the aircraft-map page
    consumes (parity: tracker.rs:42-56 + examples/adsb/dist/script.js)."""
    import json
    import urllib.request

    from futuresdr_tpu import Flowgraph, Runtime
    from futuresdr_tpu.blocks import FramedReceiverSink, VectorSource
    from futuresdr_tpu.models.adsb.tracker import TrackerBlock
    from futuresdr_tpu.runtime.ctrl_port import ControlPort
    from futuresdr_tpu.types.pmt import Pmt

    lat, lon = 48.35, 11.78
    icao = 0x3C6444
    parts = []
    for bits in (
        encode_df17(icao, callsign_me("DLH9TA")),
        encode_df17(
            icao, position_me(*cpr_encode(lat, lon, False), 37000, False)
        ),
        encode_df17(
            icao, position_me(*cpr_encode(lat, lon, True), 37000, True)
        ),
        encode_df17(icao, velocity_me(-120, 300, -640)),
    ):
        parts.append(synthesize_frame(bits, amplitude=1.0, pad=600))
    sig = np.concatenate(parts).astype(np.complex64)

    fg = Flowgraph()
    src = VectorSource(sig)
    sink = FramedReceiverSink(
        AdsbReceiver(),
        overlap=4096,
        process_size=1 << 15,
        emit=lambda f: Pmt.any_(f) if f.crc_passed else None,
    )
    tracker = TrackerBlock()
    for b in (src, sink, tracker):
        fg.add(b)
    fg.stream(src, sink)
    fg.message(sink, "frames", tracker, "in")

    cp = ControlPort(bind="127.0.0.1:0")
    try:
        h = Runtime(chunk_size=1 << 15).start(fg)
        fg_id = cp.register(h)
        h.wait(timeout=60)

        base = f"http://127.0.0.1:{cp.port}"
        (tid,) = [
            i
            for i, b in enumerate(fg.blocks)
            if "Tracker" in type(b).__name__
        ]
        req = urllib.request.Request(
            f"{base}/api/fg/{fg_id}/block/{tid}/call/ctrl_port/",
            data=b"null",
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        res = json.load(urllib.request.urlopen(req, timeout=10))
        reg = json.loads(res["String"])["register"]
        rec = reg[f"{icao:06x}"]
        assert rec["callsign"] == "DLH9TA"
        p = rec["positions"][-1]["position"]
        assert abs(p["latitude"] - lat) < 1e-2
        assert abs(p["longitude"] - lon) < 1e-2
        assert p["altitude"] == 37000
        v = rec["velocities"][-1]["velocity"]
        assert abs(v["ground_speed"] - np.hypot(-120, 300)) < 1.5
        assert v["vertical_rate"] == -640
        # wall-clock epoch, not monotonic: the map UI ages aircraft
        # against Date.now()
        assert rec["last_seen"]["secs_since_epoch"] > 1.5e9
        assert rec["positions"][-1]["time"]["secs_since_epoch"] > 1.5e9

        # the map page itself is served next to the main GUI
        html = urllib.request.urlopen(f"{base}/adsb.html", timeout=10).read()
        assert b"adsb.js" in html
        js = urllib.request.urlopen(f"{base}/adsb.js", timeout=10).read()
        assert b"ctrl_port" in js
    finally:
        cp.shutdown()

"""Aircraft tracker: CPR position decoding + per-ICAO register.

Parity: ``examples/adsb/src/tracker.rs`` — the reference keeps an
aircraft register keyed by ICAO, pairs even/odd CPR frames into global
positions (``tracker.rs:176-218`` via adsb_deku's cpr), decodes airborne
velocity (``tracker.rs:222-256``), and prunes stale records. The CPR
math here is the standard globally-unambiguous decode (ICAO Doc 9871 /
the well-known NL(lat) zone formula).

All host-side: positions arrive as decoded frames, a few per second.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

NZ = 15  # CPR latitude zones


def nl(lat: float) -> int:
    """Longitude zone count NL(lat) (ICAO Doc 9871 A-21)."""
    a = abs(lat)
    if a < 1e-9:
        return 59
    if a >= 87.0:
        return 1
    return int(
        math.floor(
            2.0
            * math.pi
            / math.acos(
                1.0
                - (1.0 - math.cos(math.pi / (2.0 * NZ)))
                / math.cos(math.radians(a)) ** 2
            )
        )
    )


def cpr_decode_global(
    even: Tuple[int, int],
    odd: Tuple[int, int],
    newest_is_odd: bool,
) -> Optional[Tuple[float, float]]:
    """Pair a 17-bit even and odd CPR frame into (lat, lon) degrees.

    Returns None when the frames straddle a latitude-zone boundary
    (NL mismatch — the reference's get_position also rejects these)."""
    scale = float(1 << 17)
    lat_e, lon_e = even[0] / scale, even[1] / scale
    lat_o, lon_o = odd[0] / scale, odd[1] / scale

    dlat_e = 360.0 / (4.0 * NZ)  # 6°
    dlat_o = 360.0 / (4.0 * NZ - 1.0)  # 360/59
    j = math.floor(59.0 * lat_e - 60.0 * lat_o + 0.5)
    rlat_e = dlat_e * ((j % 60) + lat_e)
    rlat_o = dlat_o * ((j % 59) + lat_o)
    if rlat_e >= 270.0:
        rlat_e -= 360.0
    if rlat_o >= 270.0:
        rlat_o -= 360.0
    # frames from very different latitudes can both land in the polar
    # NL=1 zone and "agree" — reject anything outside a real latitude
    if not (-90.0 <= rlat_e <= 90.0 and -90.0 <= rlat_o <= 90.0):
        return None
    if nl(rlat_e) != nl(rlat_o):
        return None
    if newest_is_odd:
        lat = rlat_o
        nl_ = nl(rlat_o)
        ni = max(nl_ - 1, 1)
        m = math.floor(lon_e * (nl_ - 1) - lon_o * nl_ + 0.5)
        lon = (360.0 / ni) * ((m % ni) + lon_o)
    else:
        lat = rlat_e
        nl_ = nl(rlat_e)
        ni = max(nl_, 1)
        m = math.floor(lon_e * (nl_ - 1) - lon_o * nl_ + 0.5)
        lon = (360.0 / ni) * ((m % ni) + lon_e)
    if lon >= 180.0:
        lon -= 360.0
    return lat, lon


def cpr_encode(lat: float, lon: float, odd: bool) -> Tuple[int, int]:
    """Encode (lat, lon) to a 17-bit CPR frame (TX/test side)."""
    scale = float(1 << 17)
    dlat = 360.0 / (4.0 * NZ - (1.0 if odd else 0.0))
    yz = math.floor(scale * ((lat % dlat) / dlat) + 0.5)
    rlat = dlat * (yz / scale + math.floor(lat / dlat))
    nl_ = max(nl(rlat) - (1 if odd else 0), 1)
    dlon = 360.0 / nl_
    xz = math.floor(scale * ((lon % dlon) / dlon) + 0.5)
    return int(yz) % (1 << 17), int(xz) % (1 << 17)


# ---------------------------------------------------------------------------
# ME field extraction from decoded 112-bit DF17 frames
# ---------------------------------------------------------------------------


def _bits_int(bits: np.ndarray, a: int, b: int) -> int:
    seg = np.asarray(bits[a:b], dtype=np.int64)
    return int(seg @ (1 << np.arange(len(seg) - 1, -1, -1)))


def parse_position_me(bits: np.ndarray) -> Optional[dict]:
    """TC 9-18 airborne position: altitude + CPR frame (F, lat, lon)."""
    tc = _bits_int(bits, 32, 37)
    if not 9 <= tc <= 18:
        return None
    alt = bits[40:52]
    altitude = None
    if alt[7]:  # Q bit
        v = np.concatenate([alt[:7], alt[8:]])
        altitude = _bits_int(v, 0, 11) * 25 - 1000
    return {
        "odd": bool(bits[53]),
        "lat_cpr": _bits_int(bits, 54, 71),
        "lon_cpr": _bits_int(bits, 71, 88),
        "altitude_ft": altitude,
    }


def parse_velocity_me(bits: np.ndarray) -> Optional[dict]:
    """TC 19 subtype 1/2 ground-speed velocity (tracker.rs:222-256)."""
    tc = _bits_int(bits, 32, 37)
    if tc != 19:
        return None
    subtype = _bits_int(bits, 37, 40)
    if subtype not in (1, 2):
        return None
    ew_dir = int(bits[45])
    ew = _bits_int(bits, 46, 56)
    ns_dir = int(bits[56])
    ns = _bits_int(bits, 57, 67)
    if ew == 0 or ns == 0:
        return None
    # subtype 2 is supersonic: velocity fields are in 4-kt units (DO-260B)
    scale = 4 if subtype == 2 else 1
    vx = (ew - 1) * scale * (-1 if ew_dir else 1)
    vy = (ns - 1) * scale * (-1 if ns_dir else 1)
    speed = math.hypot(vx, vy)
    heading = math.degrees(math.atan2(vx, vy)) % 360.0
    vr_sign = int(bits[68])
    vr = _bits_int(bits, 69, 78)
    vrate = None if vr == 0 else (vr - 1) * 64 * (-1 if vr_sign else 1)
    return {
        "ground_speed_kt": speed,
        "heading_deg": heading,
        "vertical_rate_fpm": vrate,
        "vrate_source": "geometric" if bits[67] else "barometric",
    }


# ---------------------------------------------------------------------------
# the register
# ---------------------------------------------------------------------------


@dataclass
class AircraftRecord:
    icao: int
    callsign: Optional[str] = None
    positions: List[dict] = field(default_factory=list)
    velocities: List[dict] = field(default_factory=list)
    last_seen: float = 0.0
    _cpr_even: Optional[Tuple[int, int, float]] = None
    _cpr_odd: Optional[Tuple[int, int, float]] = None


class Tracker:
    """Per-ICAO aircraft register fed with decoded frames
    (``tracker.rs:96-134`` handler → register updates).

    ``update(frame)`` takes an :class:`~.adsb.AdsbFrame` (CRC-clean);
    even/odd CPR frames within ``cpr_window`` seconds pair into global
    positions. ``prune(max_age)`` drops stale aircraft."""

    def __init__(
        self,
        cpr_window: float = 10.0,
        clock=time.monotonic,
        max_history: int = 500,
    ):
        self.register: Dict[int, AircraftRecord] = {}
        self.cpr_window = float(cpr_window)
        self._clock = clock
        # the reference keeps unbounded Vec<...> histories (lib.rs:89-90);
        # a long-running live graph needs a bound — the map only draws a
        # trail, and every ctrl_port poll serializes the whole register
        if int(max_history) < 1:
            raise ValueError("max_history must be >= 1 (latest kept)")
        self.max_history = int(max_history)

    def _rec(self, icao: int) -> AircraftRecord:
        rec = self.register.get(icao)
        if rec is None:
            rec = AircraftRecord(icao=icao)
            self.register[icao] = rec
        return rec

    def update(self, frame) -> Optional[AircraftRecord]:
        if frame.df != 17 or not frame.crc_passed:
            return None
        now = self._clock()
        rec = self._rec(frame.icao)
        rec.last_seen = now
        if frame.callsign:
            rec.callsign = frame.callsign
        pos = parse_position_me(frame.bits)
        if pos is not None:
            entry = (pos["lat_cpr"], pos["lon_cpr"], now)
            if pos["odd"]:
                rec._cpr_odd = entry
            else:
                rec._cpr_even = entry
            if rec._cpr_even and rec._cpr_odd:
                te, to = rec._cpr_even[2], rec._cpr_odd[2]
                if abs(te - to) <= self.cpr_window:
                    latlon = cpr_decode_global(
                        rec._cpr_even[:2],
                        rec._cpr_odd[:2],
                        newest_is_odd=to >= te,
                    )
                    if latlon is not None:
                        rec.positions.append(
                            {
                                "lat": latlon[0],
                                "lon": latlon[1],
                                "altitude_ft": pos["altitude_ft"],
                                "time": now,
                            }
                        )
                        if len(rec.positions) > self.max_history:
                            del rec.positions[
                                : len(rec.positions)
                                - self.max_history
                            ]
        vel = parse_velocity_me(frame.bits)
        if vel is not None:
            vel = dict(vel)
            vel["time"] = now
            rec.velocities.append(vel)
            if len(rec.velocities) > self.max_history:
                del rec.velocities[
                    : len(rec.velocities) - self.max_history
                ]
        return rec

    def prune(self, max_age: float) -> int:
        """Drop aircraft unseen for ``max_age`` seconds
        (tracker.rs prune_records)."""
        now = self._clock()
        stale = [
            icao
            for icao, rec in self.register.items()
            if now - rec.last_seen > max_age
        ]
        for icao in stale:
            del self.register[icao]
        return len(stale)


# ---------------------------------------------------------------------------
# the tracker as a flowgraph block (message plane)
# ---------------------------------------------------------------------------


def _register_json(tracker: Tracker) -> str:
    """Serialize the register in the reference's JSON shape
    (``tracker.rs:42-56`` → ``serde_json`` of ``AircraftRegister``), so
    the map UI can read ``register[icao].positions[i].position.latitude``
    etc. Times are epoch-seconds split like serde's SystemTime."""
    import json

    def t(ts: float) -> dict:
        secs = int(ts)
        return {
            "secs_since_epoch": secs,
            "nanos_since_epoch": int((ts - secs) * 1e9),
        }

    reg = {}
    for icao, rec in tracker.register.items():
        key = f"{icao:06x}"
        reg[key] = {
            "icao": key,
            "callsign": rec.callsign,
            "emitter_category": None,
            "positions": [
                {
                    "position": {
                        "latitude": p["lat"],
                        "longitude": p["lon"],
                        "altitude": p.get("altitude_ft"),
                    },
                    "time": t(p["time"]),
                }
                for p in rec.positions
            ],
            "velocities": [
                {
                    "velocity": {
                        "ground_speed": v.get("ground_speed_kt"),
                        "heading": v.get("heading_deg"),
                        "vertical_rate": v.get("vertical_rate_fpm"),
                        "vertical_rate_source": v.get("vrate_source"),
                    },
                    "time": t(v["time"]),
                }
                for v in rec.velocities
            ],
            "last_seen": t(rec.last_seen),
        }
    return json.dumps({"register": reg})


from futuresdr_tpu.runtime.block import Block, message_handler  # noqa: E402
from futuresdr_tpu.types.pmt import Pmt, PmtKind  # noqa: E402


class TrackerBlock(Block):
    """The tracker as a message-plane flowgraph block
    (parity: ``tracker.rs:13-96`` — ``#[message_inputs(in, ctrl_port)]``).

    ``in`` accepts decoded frames: an :class:`AdsbFrame` (in-process
    Pmt.Any, what :class:`~futuresdr_tpu.blocks.FramedReceiverSink`
    posts with a custom emit) or a packed 14-byte blob of the raw
    112 bits (serializable across process boundaries; malformed blobs
    are counted in ``n_malformed`` and dropped — a bad frame must not
    kill a live flowgraph).  ``ctrl_port`` with Pmt.Null replies
    Pmt.String(JSON register) — the route the aircraft-map page polls,
    exactly the reference's handler contract (``tracker.rs:42-56``).

    Uses wall-clock time (``time.time``): register timestamps are an
    external artifact serialized as ``secs_since_epoch`` (the map UI
    ages aircraft against ``Date.now()``)."""

    def __init__(
        self,
        prune_after: Optional[float] = None,
        cpr_window: float = 10.0,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.tracker = Tracker(cpr_window=cpr_window, clock=time.time)
        self.prune_after = prune_after
        self.n_malformed = 0

    @message_handler("in")
    def _in(self, pmt: "Pmt") -> "Pmt":
        if pmt.is_finished():
            return Pmt.ok()
        v = pmt.to_py()
        frame = v
        if isinstance(v, (bytes, bytearray)):
            from futuresdr_tpu.models.adsb.adsb import frame_from_bits

            try:
                bits = np.unpackbits(np.frombuffer(bytes(v), np.uint8))
                frame = frame_from_bits(bits)
            except ValueError:
                self.n_malformed += 1
                return Pmt.ok()
        if frame is not None:
            self.tracker.update(frame)
        if self.prune_after is not None:
            self.tracker.prune(self.prune_after)
        return Pmt.ok()

    @message_handler("ctrl_port")
    def _ctrl(self, pmt: "Pmt") -> "Pmt":
        if pmt.is_finished():
            return Pmt.ok()
        return Pmt(PmtKind.STRING, _register_json(self.tracker))

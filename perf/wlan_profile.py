"""Phase breakdown of the WLAN receiver on a dense capture.

Times each stage of WlanReceiver.process separately so the next
optimization targets the real cost: phase-1 dispatch+fetch, phase-B
front-end dispatch, decode-tail dispatch+fetch, host bookkeeping.

Run:  python perf/wlan_profile.py [--frames 400] [--reps 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from futuresdr_tpu.models.wlan import (  # noqa: E402
    WlanReceiver,
    encode_frame,
    make_mac_frame,
    prepare_device_iq,
)
from futuresdr_tpu.models.wlan import rx as R  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--mcs", default="qpsk12")
    ap.add_argument("--bytes", type=int, default=500)
    ap.add_argument("--gap", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    chunks = []
    for i in range(args.frames):
        psdu = make_mac_frame(
            rng.integers(0, 256, args.bytes, dtype=np.uint8).tobytes(), seq=i
        )
        chunks.append(encode_frame(psdu, args.mcs, scrambler_seed=1 + i % 127))
        chunks.append(np.zeros(args.gap, np.complex64))
    sig = np.concatenate(chunks).astype(np.complex64)
    print(f"# capture: {len(sig)/1e6:.2f} M samples, {args.frames} frames")

    kmax = args.frames + 4
    x, n_real, bucket = prepare_device_iq(sig)

    # warm everything through one full process() call
    t0 = time.perf_counter()
    frames = WlanReceiver(max_frames_per_chunk=kmax).process(x)
    print(
        f"# warm process(): {time.perf_counter()-t0:.2f}s, "
        f"{sum(f.crc_ok for f in frames)}/{args.frames} ok"
    )

    kk = max(16, kmax)
    det = R._detect_program(kk, kmax)
    sig_p = R._signal_program(kk)

    for rep in range(args.reps):
        # --- phase 1: detect + SIGNAL dispatch, one combined fetch
        t0 = time.perf_counter()
        starts_d, valid_d, foff_d, _nlead = det(x, jnp.int32(n_real))
        t_disp = time.perf_counter() - t0
        dec_d, snr_d = sig_p(x, starts_d, foff_d)
        jax.block_until_ready((starts_d, dec_d))
        t_ready = time.perf_counter() - t0
        t0 = time.perf_counter()
        starts_a, valid_a, foff_a, dec_a, _snr_a = jax.device_get(
            (starts_d, valid_d, foff_d, dec_d, snr_d)
        )
        t_fetch = time.perf_counter() - t0

        # --- host candidate bookkeeping
        t0 = time.perf_counter()
        import futuresdr_tpu.models.wlan.consts as C

        rate_f, parity, length_f = R.unpack_signal_fields(dec_a)
        cands, params, fsh = [], [], []
        for j in range(kk):
            if not valid_a[j]:
                continue
            cands.append(int(starts_a[j]))
            fsh.append(float(foff_a[j]))
            mcs = C.RATE_TO_MCS.get(int(rate_f[j]))
            length = int(length_f[j])
            if not parity[j] or mcs is None or length == 0:
                params.append(None)
            else:
                params.append(C.FrameParam(mcs, length))
        k = len(cands)
        if k == 0 or all(p is None for p in params):
            print(f"rep{rep}: no decodable frames (k={k})")
            continue
        kb = 1 << (k - 1).bit_length()
        starts_np = np.zeros(kb, np.int32)
        starts_np[:k] = cands
        fsh_np = np.zeros(kb, np.float32)
        fsh_np[:k] = fsh
        nmax = max(p.n_symbols for p in params if p is not None)
        nf = min(R.MAX_SYMS, -(-nmax // 16) * 16)
        t_host1 = time.perf_counter() - t0

        # --- phase B front-end
        t0 = time.perf_counter()
        eq_b, _, _, _, _ = R._frame_front_from_starts(kb, nf + 1)(
            x, jnp.asarray(starts_np), jnp.asarray(fsh_np)
        )
        eq_data = eq_b[:, 1 : 1 + nf]
        jax.block_until_ready(eq_data.re)
        t_front = time.perf_counter() - t0

        # --- decode tail (single MCS group here)
        t0 = time.perf_counter()
        nbits = np.zeros(kb, np.int32)
        for i, p in enumerate(params):
            if p is not None:
                nbits[i] = p.n_data_bits
        tail = R._device_decode_tail(args.mcs, nf)
        by_dev = tail(eq_data, jnp.asarray(nbits))
        jax.block_until_ready(by_dev)
        t_tail = time.perf_counter() - t0
        t0 = time.perf_counter()
        by = np.asarray(by_dev[:k])
        t_tfetch = time.perf_counter() - t0

        # --- host CRC
        t0 = time.perf_counter()
        import zlib

        ok = 0
        for i, p in enumerate(params):
            if p is None:
                continue
            psdu = bytes(by[i, 2 : p.psdu_size + 2])
            ok += (zlib.crc32(psdu) & 0xFFFFFFFF) == R.CRC32_RESIDUE
        t_crc = time.perf_counter() - t0

        total = t_ready + t_fetch + t_host1 + t_front + t_tail + t_tfetch + t_crc
        print(
            f"rep{rep}: p1_disp={t_disp*1e3:.1f}ms p1_exec={t_ready*1e3:.1f}ms "
            f"p1_fetch={t_fetch*1e3:.1f}ms host1={t_host1*1e3:.1f}ms "
            f"front={t_front*1e3:.1f}ms tail={t_tail*1e3:.1f}ms "
            f"tail_fetch={t_tfetch*1e3:.1f}ms crc={t_crc*1e3:.1f}ms "
            f"| total={total*1e3:.1f}ms -> {len(sig)/total/1e6:.2f} MS/s "
            f"(ok {ok}/{args.frames}, nf={nf}, kb={kb})"
        )


if __name__ == "__main__":
    main()

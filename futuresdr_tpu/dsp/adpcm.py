"""IMA (DVI4) ADPCM WAV codec — in-process compressed-audio decode.

The reference's ``audio::FileSource`` decodes compressed formats through
rodio (``src/blocks/audio/file_source.rs:93``). This container has no
ffmpeg/codec binaries, so the subprocess fallback never executes in CI;
this module gives :class:`~futuresdr_tpu.blocks.audio.AudioFileSource` a
real compressed format (4.05:1 over 16-bit PCM) that decodes natively:
IMA ADPCM inside WAV (format tag 0x11), the classic block-structured
4-bit differential codec every player understands.

The quantizer core (step/index tables, nibble reconstruction) is the
published IMA spec; it is cross-validated byte-exactly against CPython's
independent C implementation (``audioop``, the Intel/DVI variant) in
``tests/test_audio_driver.py``, so the decode path has third-party
ground truth even in this codec-free container.

Block layout (Microsoft WAVE_FORMAT_IMA_ADPCM): per channel a 4-byte
header (int16 predictor = first sample, uint8 step index, reserved),
then 4-bit nibbles low-first, mono sequential / stereo interleaved in
4-byte words per channel. samples_per_block = (block_align − 4·ch)·2/ch
+ 1.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Tuple

import numpy as np

STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ],
    dtype=np.int32,
)
INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)


def _reconstruct(nib, pred, index):
    """One IMA step for arrays of parallel streams: returns
    (new_pred, new_index). ``nib`` uint8 in [0,16)."""
    step = STEP_TABLE[index]
    diff = step >> 3
    diff = diff + np.where(nib & 1, step >> 2, 0)
    diff = diff + np.where(nib & 2, step >> 1, 0)
    diff = diff + np.where(nib & 4, step, 0)
    pred = np.where(nib & 8, pred - diff, pred + diff)
    pred = np.clip(pred, -32768, 32767)
    index = np.clip(index + INDEX_TABLE[nib & 7], 0, 88)
    return pred, index


def _quantize(delta, index):
    """Inverse of :func:`_reconstruct`'s diff: sample delta → nibble +
    the exact reconstructed diff (arrays of parallel streams)."""
    step = STEP_TABLE[index]
    nib = np.where(delta < 0, 8, 0).astype(np.int32)
    mag = np.abs(delta)
    b2 = mag >= step
    mag = mag - np.where(b2, step, 0)
    b1 = mag >= (step >> 1)
    mag = mag - np.where(b1, step >> 1, 0)
    b0 = mag >= (step >> 2)
    nib = nib | (b2 << 2) | (b1 << 1) | (b0 << 0)
    return nib.astype(np.uint8)


def decode_blocks(
    raw: np.ndarray, channels: int, block_align: int
) -> np.ndarray:
    """[n_bytes] uint8 of whole ADPCM blocks → float32 interleaved
    samples in [-1, 1). Vectorized across blocks (the recurrence is
    sequential in the ~505 samples per block, parallel over blocks)."""
    if channels not in (1, 2):
        raise ValueError("IMA ADPCM: 1 or 2 channels only")
    bpc = block_align // channels - 4  # data bytes per channel
    spb = bpc * 2 + 1  # samples per block per channel
    nb = len(raw) // block_align
    blocks = raw[: nb * block_align].reshape(nb, block_align)
    out = np.empty((nb, spb, channels), np.int32)
    preds = np.empty((nb, channels), np.int32)
    idxs = np.empty((nb, channels), np.int32)
    datas = []
    for c in range(channels):
        hdr = blocks[:, 4 * c : 4 * c + 4]
        preds[:, c] = (
            hdr[:, 0].astype(np.int32) | (hdr[:, 1].astype(np.int32) << 8)
        )
        preds[:, c] = np.where(
            preds[:, c] >= 32768, preds[:, c] - 65536, preds[:, c]
        )
        idxs[:, c] = np.clip(hdr[:, 2].astype(np.int32), 0, 88)
        body = blocks[:, 4 * channels :]
        if channels == 1:
            data = body
        else:
            # stereo: alternating 4-byte words per channel
            words = body.reshape(nb, -1, 2, 4)
            data = words[:, :, c, :].reshape(nb, -1)
        datas.append(data)
    out[:, 0, :] = preds
    # nibble streams: [nb, bpc] bytes → [nb, 2*bpc] nibbles, low first
    nibs = [
        np.stack([d & 0xF, d >> 4], axis=-1).reshape(nb, -1)
        for d in datas
    ]
    pred = preds.copy()
    index = idxs.copy()
    for s in range(spb - 1):
        for c in range(channels):
            p, ix = _reconstruct(nibs[c][:, s], pred[:, c], index[:, c])
            pred[:, c] = p
            index[:, c] = ix
            out[:, s + 1, c] = p
    return (out.astype(np.float32) / 32768.0).reshape(-1)


def encode_blocks(
    pcm: np.ndarray, channels: int, block_align: int
) -> bytes:
    """float32/int16 interleaved samples → ADPCM block bytes
    (pads the tail block by repeating the last sample)."""
    if pcm.dtype != np.int16:
        pcm = np.clip(
            np.asarray(pcm, np.float64) * 32768.0, -32768, 32767
        ).astype(np.int16)
    x = pcm.reshape(-1, channels).astype(np.int32)
    bpc = block_align // channels - 4
    spb = bpc * 2 + 1
    n = len(x)
    nb = -(-n // spb)
    if nb * spb != n:
        x = np.concatenate([x, np.tile(x[-1:], (nb * spb - n, 1))])
    x = x.reshape(nb, spb, channels)
    pred = x[:, 0, :].copy()
    # per-block starting step index from the block's own delta scale
    # (blocks are independent — the header carries the index — so
    # seeding from the signal beats the naive 0 start by ~15 dB on
    # tones: adaptation from step 7 otherwise re-climbs every block)
    med = np.median(
        np.abs(np.diff(x, axis=1)).astype(np.float64), axis=1
    )  # [nb, channels]
    index = np.argmin(
        np.abs(STEP_TABLE[None, None, :] - med[:, :, None]), axis=-1
    ).astype(np.int32)
    index0 = index.copy()  # written to the block headers below
    nibs = np.empty((nb, spb - 1, channels), np.uint8)
    for s in range(spb - 1):
        for c in range(channels):
            delta = x[:, s + 1, c] - pred[:, c]
            nib = _quantize(delta, index[:, c])
            p, ix = _reconstruct(nib, pred[:, c], index[:, c])
            nibs[:, s, c] = nib
            pred[:, c] = p
            index[:, c] = ix
    blocks = np.zeros((nb, block_align), np.uint8)
    for c in range(channels):
        p0 = x[:, 0, c]
        blocks[:, 4 * c] = p0 & 0xFF
        blocks[:, 4 * c + 1] = (p0 >> 8) & 0xFF
        # header carries the index used for the FIRST delta
        blocks[:, 4 * c + 2] = index0[:, c].astype(np.uint8)
        packed = (
            nibs[:, 0::2, c] | (nibs[:, 1::2, c] << 4)
        ).astype(np.uint8)
        if channels == 1:
            blocks[:, 4:] = packed
        else:
            words = blocks[:, 4 * channels :].reshape(nb, -1, 2, 4)
            words[:, :, c, :] = packed.reshape(nb, -1, 4)
            blocks[:, 4 * channels :] = words.reshape(nb, -1)
    return blocks.tobytes()


def read_ima_wav(path) -> Tuple[np.ndarray, int, int]:
    """Parse a WAVE_FORMAT_IMA_ADPCM (0x11) file → (float32 interleaved,
    sample_rate, channels)."""
    raw = Path(path).read_bytes()
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    fact_samples = None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack_from("<I", raw, pos + 4)
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            (fact_samples,) = struct.unpack_from("<I", body, 0)
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    tag, channels, rate, _, block_align, _ = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if tag != 0x11:
        raise ValueError(f"{path}: format tag {tag:#x} is not IMA ADPCM")
    pcm = decode_blocks(
        np.frombuffer(data, np.uint8), channels, block_align
    )
    if fact_samples is not None:
        pcm = pcm[: fact_samples * channels]
    return pcm.astype(np.float32), rate, channels


def write_ima_wav(
    path, samples: np.ndarray, sample_rate: int, channels: int = 1,
    block_align: int = 256,
) -> None:
    """Encode float32/int16 samples to an IMA ADPCM WAV file."""
    n_frames = len(np.asarray(samples).reshape(-1, channels))
    body = encode_blocks(np.asarray(samples), channels, block_align)
    bpc = block_align // channels - 4
    spb = bpc * 2 + 1
    avg_bps = sample_rate * block_align // spb
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, channels, sample_rate, avg_bps, block_align,
        4,  # bits per sample
        2,  # cbSize
        spb,  # samples per block
    )
    fact = struct.pack("<I", n_frames)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(body)) + body
    )
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    Path(path).write_bytes(riff)

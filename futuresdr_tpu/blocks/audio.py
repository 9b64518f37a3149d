"""Audio blocks.

Parity: ``src/blocks/audio/{audio_sink,audio_source,file_source,
wav_sink}.rs`` (cpal/rodio/hound). The container has no audio hardware or
``sounddevice``; the sink plays through ``sounddevice`` when available and
otherwise falls back to a WAV file (the honest equivalent of the
reference's feature gate — audio is an optional cargo feature there too).
"""

from __future__ import annotations

import wave
from pathlib import Path
from typing import Optional

import numpy as np

from futuresdr_tpu.blocks.io import WavSink
from futuresdr_tpu.runtime.block import Block, PortSpec

try:  # pragma: no cover - environment dependent
    import sounddevice as _sd
except Exception:  # noqa: BLE001
    _sd = None

# The ``sounddevice`` branches are exercised against a fake driver with
# the real stream API (tests/test_audio_driver.py — the dummy-driver
# pattern); they have not run on physical audio hardware, since this
# build environment has none.


def supported_sample_rates():
    """Parity: AudioSink::supported_sample_rates (audio/audio_sink.rs)."""
    return [48_000, 44_100, 32_000, 16_000, 8_000]


class AudioSink(Block):
    """Play f32 audio; with no hardware it streams to ``fallback_path``
    WAV instead (parity: audio/audio_sink.rs:263)."""

    def __init__(
        self,
        sample_rate: int = 48_000,
        channels: int = 1,
        fallback_path="audio_out.wav",
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.sample_rate = int(sample_rate)
        self.channels = int(channels)
        self.is_blocking = True
        self.stream_inputs = [PortSpec("in", np.float32)]
        self.rate_in = (1,)
        self._stream = None
        self._wav: Optional[WavSink] = None
        if _sd is not None:
            self._stream = _sd.OutputStream(
                samplerate=self.sample_rate, channels=self.channels
            )
            self._stream.start()
        else:
            self._wav = WavSink(
                fallback_path, self.sample_rate, self.channels
            )

    def host_consume(self, arr: np.ndarray, tags, port: int = 0) -> None:
        if self._stream is not None:
            self._stream.write(
                np.ascontiguousarray(arr, dtype=np.float32).reshape(
                    -1, self.channels
                )
            )
        else:
            self._wav.host_consume(arr, tags, port)

    def on_finish(self) -> None:
        if self._stream is not None:
            self._stream.stop()
        if self._wav is not None:
            self._wav.on_finish()


class AudioSource(Block):
    """Capture f32 audio (parity: audio/audio_source.rs:190); without
    hardware raises at construction — use :class:`AudioFileSource`."""

    def __init__(
        self,
        sample_rate: int = 48_000,
        channels: int = 1,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        if _sd is None:
            raise RuntimeError(
                "no audio capture backend on this host — use "
                "AudioFileSource or a network ingest block"
            )
        self.sample_rate = int(sample_rate)
        self.channels = int(channels)
        self.is_blocking = True
        self.stream_outputs = [PortSpec("out", np.float32)]
        self.rate_out = (1,)
        self._stream = _sd.InputStream(
            samplerate=self.sample_rate, channels=self.channels
        )
        self._stream.start()

    def host_produce(self, n: int, port: int = 0):
        data, _ = self._stream.read(n)
        return np.asarray(data, dtype=np.float32).reshape(-1)


def _read_wav_raw(path: Path):
    """RIFF reader for the WAV formats the stdlib ``wave`` module
    rejects: IEEE float (tag 3, f32/f64) and G.711 A-law/µ-law
    (tags 6/7). Returns ``(float32 interleaved, rate, channels)``."""
    import struct

    with open(path, "rb") as f:
        hdr = f.read(12)
        if hdr[:4] != b"RIFF" or hdr[8:12] != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        tag = rate = channels = bits = None
        data = None
        while True:
            ch = f.read(8)
            if len(ch) < 8:
                break
            cid = ch[:4]
            (size,) = struct.unpack("<I", ch[4:])
            if cid == b"fmt ":
                fmt = f.read(size + (size & 1))
                tag, channels, rate, _, _, bits = struct.unpack(
                    "<HHIIHH", fmt[:16]
                )
            elif cid == b"data":
                data = f.read(size)
                if len(data) != size:
                    raise ValueError(
                        f"{path}: data chunk truncated "
                        f"({len(data)} of {size} bytes)"
                    )
                f.seek(size & 1, 1)
            else:
                f.seek(size + (size & 1), 1)
    if tag is None or data is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    if tag == 3:
        dt = np.float32 if bits == 32 else np.float64
        out = np.frombuffer(data, dt).astype(np.float32)
    elif tag == 6:
        from futuresdr_tpu.dsp.g711 import alaw_decode

        out = alaw_decode(data).astype(np.float32) / 32768.0
    elif tag == 7:
        from futuresdr_tpu.dsp.g711 import ulaw_decode

        out = ulaw_decode(data).astype(np.float32) / 32768.0
    else:
        raise ValueError(f"{path}: unsupported WAVE format tag {tag}")
    return out, int(rate), int(channels)


def _decode_via_ffmpeg(path: Path):
    """Decode any compressed audio file (mp3/flac/ogg/m4a/…) to f32 PCM
    through an ``ffmpeg`` subprocess — the documented fallback for the
    formats rodio decodes natively in the reference
    (``audio/file_source.rs``). Vendoring an MP3 decoder would be ~1.5k
    lines of tables for a path every deployment image covers with
    ffmpeg; this keeps the capability without the bloat.

    Returns ``(interleaved_f32, sample_rate, channels)``. Raises
    ``RuntimeError`` with a clear message when ffmpeg is absent."""
    import json
    import shutil
    import subprocess

    ffprobe = shutil.which("ffprobe")
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError(
            f"cannot decode {path.suffix!r}: only PCM WAV decoding is "
            "built in; compressed formats need `ffmpeg` on PATH "
            "(apt install ffmpeg) — the documented fallback for the "
            "reference's rodio-decoded formats"
        )
    rate, channels = None, None
    if ffprobe is not None:
        try:
            probe = subprocess.run(
                [
                    ffprobe, "-v", "error", "-select_streams", "a:0",
                    "-show_entries", "stream=sample_rate,channels",
                    "-of", "json", str(path),
                ],
                capture_output=True,
                check=True,
            )
            st = json.loads(probe.stdout)["streams"][0]
            rate = int(st["sample_rate"])
            channels = int(st["channels"])
        except (subprocess.CalledProcessError, KeyError, IndexError,
                ValueError, json.JSONDecodeError):
            rate = channels = None  # fall through to the forced-rate path
    cmd = [ffmpeg, "-v", "error", "-i", str(path), "-f", "f32le",
           "-acodec", "pcm_f32le"]
    if rate is None:
        # no trustworthy stream metadata: MAKE the assumed rate/layout
        # true by resampling in the decoder, rather than mislabeling the
        # stream (a silently wrong sample_rate pitch-shifts everything
        # downstream)
        rate, channels = 48000, 1
        cmd += ["-ar", str(rate), "-ac", str(channels)]
    try:
        out = subprocess.run(cmd + ["-"], capture_output=True, check=True)
    except subprocess.CalledProcessError as e:
        raise RuntimeError(
            f"ffmpeg could not decode {path}: "
            f"{e.stderr.decode(errors='replace').strip()[:200]}"
        ) from e
    data = np.frombuffer(out.stdout, np.float32)
    if data.size == 0:
        raise RuntimeError(f"{path} contains no decodable audio stream")
    return data, rate, channels


class AudioFileSource(Block):
    """Decode an audio file into f32 samples (parity: audio/file_source.rs
    — rodio decodes mp3/flac there). PCM WAV decodes in-process via the
    stdlib; IMA ADPCM WAV (format 0x11 — a real 4:1 compressed format)
    decodes in-process via :mod:`futuresdr_tpu.dsp.adpcm`; IEEE-float
    WAV (format 3, f32/f64), G.711 A-law/µ-law (formats 6/7, via
    :mod:`futuresdr_tpu.dsp.g711` — byte-exact vs audioop) and 24-bit
    PCM decode in-process too; other compressed formats (mp3/flac/
    ogg/…) decode through :func:`_decode_via_ffmpeg` when ffmpeg is on
    PATH."""

    def __init__(self, path, repeat: bool = False, name: Optional[str] = None):
        super().__init__(name)
        self.path = Path(path)
        self.repeat = repeat
        self.is_blocking = True
        tag = (
            self._wav_format_tag()
            if self.path.suffix.lower() == ".wav"
            else None
        )
        if tag is None:
            data, self.sample_rate, self.channels = _decode_via_ffmpeg(
                self.path
            )
        elif tag == 0x11:
            from futuresdr_tpu.dsp.adpcm import read_ima_wav

            data, self.sample_rate, self.channels = read_ima_wav(
                self.path
            )
        elif tag in (3, 6, 7):
            data, self.sample_rate, self.channels = _read_wav_raw(
                self.path
            )
        else:
            with wave.open(str(self.path), "rb") as w:
                self.sample_rate = w.getframerate()
                self.channels = w.getnchannels()
                width = w.getsampwidth()
                raw = w.readframes(w.getnframes())
            if width == 2:
                data = (
                    np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
                )
            elif width == 1:
                data = (
                    np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0
                ) / 128.0
            elif width == 3:
                b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
                v = (
                    b[:, 0].astype(np.int32)
                    | (b[:, 1].astype(np.int32) << 8)
                    | (b[:, 2].astype(np.int32) << 16)
                )
                v -= (v & 0x800000) << 1  # sign-extend 24-bit
                data = v.astype(np.float32) / 2**23
            elif width == 4:
                data = (
                    np.frombuffer(raw, np.int32).astype(np.float32) / 2**31
                )
            else:
                raise ValueError(f"unsupported sample width {width}")
        self._data = data  # interleaved channels
        self._pos = 0
        self.stream_outputs = [PortSpec("out", np.float32)]
        self.rate_out = (1,)

    def _wav_format_tag(self) -> int:
        """Peek the RIFF fmt chunk's format tag (1 = PCM, 0x11 = IMA
        ADPCM, …) by seeking over chunk headers — no full-file read (a
        multi-hundred-MB PCM WAV must not be loaded twice just to learn
        it is PCM); 1 on any parse surprise so the stdlib path raises
        its own clearer error."""
        import struct

        try:
            with open(self.path, "rb") as f:
                hdr = f.read(12)
                if hdr[:4] != b"RIFF" or hdr[8:12] != b"WAVE":
                    return 1
                while True:
                    ch = f.read(8)
                    if len(ch) < 8:
                        return 1
                    cid = ch[:4]
                    (size,) = struct.unpack("<I", ch[4:])
                    if cid == b"fmt " and size >= 2:
                        return struct.unpack("<H", f.read(2))[0]
                    f.seek(size + (size & 1), 1)
        except Exception:  # noqa: BLE001 - fall through to stdlib
            pass
        return 1

    def host_produce(self, n: int, port: int = 0):
        total = len(self._data)
        if self._pos >= total:
            if not self.repeat:
                return None
            self._pos = 0
        end = min(self._pos + n, total)
        out = self._data[self._pos : end]
        self._pos = end
        return out

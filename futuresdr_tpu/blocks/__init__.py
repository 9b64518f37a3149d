"""Standard block library.

Parity: ``src/blocks/`` (~60 blocks, doc tables ``src/blocks/mod.rs:1-110``).
Blocks here are thin declarative wrappers over :mod:`futuresdr_tpu.ops`
device kernels plus the host-I/O boundary classes; all device math traces
into the single fused XLA step the compiler emits.
"""

from futuresdr_tpu.blocks.functional import (
    Apply,
    Combine,
    Filter,
    FiniteSource,
    Sink,
    Source,
    Split,
)
from futuresdr_tpu.blocks.stream import (
    Copy,
    Delay,
    Head,
    MovingAvg,
    Selector,
    StreamDeinterleaver,
    StreamDuplicator,
    TagDebug,
    Throttle,
)
from futuresdr_tpu.blocks.message import (
    MessageAnnotator,
    MessageApply,
    MessageBurst,
    MessageCopy,
    MessagePipe,
    MessageSink,
    MessageSource,
)
from futuresdr_tpu.blocks.net import (
    BlobToUdp,
    TcpSink,
    TcpSource,
    UdpIqSource,
    UdpSource,
    WebsocketPmtSink,
    WebsocketSink,
)
from futuresdr_tpu.blocks.io import (
    ChannelSink,
    ChannelSource,
    FileSink,
    FileSource,
    IQFileSource,
    NullSink,
    NullSource,
    ResidentSource,
    VectorSink,
    VectorSource,
    WavSink,
)
from futuresdr_tpu.blocks.dsp import (
    Agc,
    ClockRecoveryMM,
    Fft,
    Fir,
    Iir,
    IirBuilder,
    QuadratureDemod,
    SignalSource,
    XlatingFir,
)
from futuresdr_tpu.blocks.functional import ApplyIntoIter, ApplyNM
from futuresdr_tpu.blocks.pfb import (
    PfbArbResampler,
    PfbChannelizer,
    PfbFmBank,
    PfbSynthesizer,
)
from futuresdr_tpu.blocks.audio import (
    AudioFileSource,
    AudioSink,
    AudioSource,
)
from futuresdr_tpu.blocks import seify, zeromq
from futuresdr_tpu.blocks.dsp import FreqShift, WeaverDecode
from futuresdr_tpu.blocks.framed import FramedReceiverSink

__all__ = [
    "FramedReceiverSink",
    "Apply",
    "Combine",
    "Filter",
    "FiniteSource",
    "Sink",
    "Source",
    "Split",
    "Copy",
    "Delay",
    "Head",
    "MovingAvg",
    "Selector",
    "StreamDeinterleaver",
    "StreamDuplicator",
    "TagDebug",
    "Throttle",
    "MessageAnnotator",
    "MessageApply",
    "MessageBurst",
    "MessageCopy",
    "MessagePipe",
    "MessageSink",
    "MessageSource",
    "BlobToUdp",
    "TcpSink",
    "TcpSource",
    "UdpIqSource",
    "UdpSource",
    "WebsocketPmtSink",
    "WebsocketSink",
    "ChannelSink",
    "ChannelSource",
    "FileSink",
    "FileSource",
    "IQFileSource",
    "NullSink",
    "NullSource",
    "ResidentSource",
    "VectorSink",
    "VectorSource",
    "WavSink",
    "Agc",
    "ClockRecoveryMM",
    "Fft",
    "Fir",
    "Iir",
    "IirBuilder",
    "QuadratureDemod",
    "SignalSource",
    "XlatingFir",
    "PfbArbResampler",
    "PfbChannelizer",
    "PfbFmBank",
    "PfbSynthesizer",
    "ApplyIntoIter",
    "ApplyNM",
    "AudioFileSource",
    "AudioSink",
    "AudioSource",
    "FreqShift",
    "WeaverDecode",
    "seify",
    "zeromq",
]

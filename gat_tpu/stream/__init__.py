from .ring import RingBuffer  # noqa: F401
from .live import LiveTranscriber, ArraySource, MicSource  # noqa: F401

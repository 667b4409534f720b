from .ring import RingBuffer  # noqa: F401
from .live import LiveTranscriber, ArraySource, MicSource  # noqa: F401
from .scan import ScanStreamer  # noqa: F401

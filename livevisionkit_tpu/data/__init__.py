from livevisionkit_tpu.data.frame import Frame, PixelFormat
from livevisionkit_tpu.data.stream_buffer import StreamBuffer

__all__ = ["Frame", "PixelFormat", "StreamBuffer"]

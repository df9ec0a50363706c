"""Structured record logging: console + CSV.

Reference parity: ``lvk::Logger`` — a stream-oriented logger with record /
object framing and hold/resume (reference Logging/Logger.hpp:27-92) — and
``lvk::CSVLogger`` (Logging/CSVLogger.hpp:27-41), plus the drop-anywhere
`INIT_CSV` macro (Directives.hpp:101-111).  Used by the CLI for per-frame
diagnostics (tracking stability, trust, frame times) the way the reference's
VideoProcessor logs per-filter timings (VideoProcessor.cpp:312-356).
"""

from __future__ import annotations

import csv
import io
import sys
from typing import Any, Iterable, TextIO


class RecordLogger:
    """Writes records (one line each) of delimited values to a text stream.

    `hold()` buffers output until `resume()` (reference Logger hold/resume).
    """

    def __init__(self, stream: TextIO | None = None, delimiter: str = " "):
        self._stream = stream if stream is not None else sys.stderr
        self._delim = delimiter
        self._held: io.StringIO | None = None

    def _out(self) -> TextIO:
        return self._held if self._held is not None else self._stream

    def record(self, *values: Any) -> None:
        print(self._delim.join(str(v) for v in values), file=self._out())

    def hold(self) -> None:
        if self._held is None:
            self._held = io.StringIO()

    def resume(self) -> None:
        if self._held is not None:
            self._stream.write(self._held.getvalue())
            self._held = None


class CSVLogger:
    """CSV record logger with a lazily written header row."""

    def __init__(self, path: str, fieldnames: Iterable[str]):
        self.path = path
        self.fieldnames = list(fieldnames)
        self._file: TextIO | None = None
        self._writer = None

    def _ensure(self):
        if self._file is None:
            self._file = open(self.path, "w", newline="")
            self._writer = csv.DictWriter(self._file, fieldnames=self.fieldnames)
            self._writer.writeheader()

    def record(self, **values: Any) -> None:
        self._ensure()
        self._writer.writerow({k: values.get(k, "") for k in self.fieldnames})

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

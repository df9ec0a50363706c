"""RecordLogger / CSVLogger framing tests (reference Logging/Logger.hpp)."""

import io

from livevisionkit_tpu.utils.logging import CSVLogger, RecordLogger


def test_record_framing():
    buf = io.StringIO()
    log = RecordLogger(buf, delimiter=",")
    log.record("a", 1, 2.5)
    log.record("b")
    assert buf.getvalue() == "a,1,2.5\nb\n"


def test_object_framing():
    buf = io.StringIO()
    log = RecordLogger(buf)
    log.write("frame", 7)
    log.begin_object()
    log.write("x", 1.0)
    log.write("y", 2.0)
    log.end_object()
    log.end_record()
    assert buf.getvalue() == "frame 7 {x 1.0 y 2.0}\n"


def test_hold_resume():
    buf = io.StringIO()
    log = RecordLogger(buf)
    log.record("first")
    log.hold()
    log.record("held")
    assert buf.getvalue() == "first\n"
    log.resume()
    assert buf.getvalue() == "first\nheld\n"


def test_csv_logger(tmp_path):
    path = tmp_path / "out.csv"
    with CSVLogger(str(path), ["frame", "ms"]) as log:
        log.record(frame=0, ms=1.5)
        log.record(frame=1)
    lines = path.read_text().strip().splitlines()
    assert lines[0] == "frame,ms"
    assert lines[1] == "0,1.5"
    assert lines[2] == "1,"

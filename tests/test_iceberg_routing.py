"""Executed coverage for the Iceberg source/sink routing (dedup/io.py S1/S3).

The sandbox has no Iceberg jar, so the cluster branch can't run for real;
these tests monkeypatch `_has_iceberg` and drive the routing with recording
stubs, asserting the exact reader/writer calls the cluster path would issue
(format("iceberg"), snapshot-id option wiring, writeTo append/replace) and
that path-like sources always fall back to parquet.
"""

from __future__ import annotations

import pytest

from dedup import io as dio


class FakeDF:
    def __init__(self, log, name="df"):
        self.log = log
        self._name = name

    def select(self, *cols):
        self.log.append(("select", tuple(cols)))
        return self


class FakeReader:
    def __init__(self, log):
        self.log = log

    def format(self, f):
        self.log.append(("format", f))
        return self

    def option(self, k, v):
        self.log.append(("option", k, v))
        return self

    def load(self, src):
        self.log.append(("load", src))
        return FakeDF(self.log)

    def schema(self, s):
        self.log.append(("schema", s.simpleString()))
        return self

    def parquet(self, path):
        self.log.append(("parquet", path))
        return FakeDF(self.log)


class FakeSession:
    def __init__(self, log):
        self.log = log
        self.read = FakeReader(log)

    def sql(self, q):
        self.log.append(("sql", q))

        class _Res:
            def head(self_inner):
                return [1234]

        return _Res()


class FakeWriter:
    def __init__(self, log):
        self.log = log

    def mode(self, m):
        self.log.append(("mode", m))
        return self

    def parquet(self, path):
        self.log.append(("parquet", path))


class FakeWriteTo:
    def __init__(self, log, target):
        self.log = log
        self.target = target

    def append(self):
        self.log.append(("writeTo.append", self.target))

    def createOrReplace(self):
        self.log.append(("writeTo.createOrReplace", self.target))


class FakeOutDF:
    def __init__(self, log):
        self.log = log
        self.sparkSession = object()
        self.write = FakeWriter(log)

    def writeTo(self, target):
        return FakeWriteTo(self.log, target)


def test_read_iceberg_table_with_snapshot(monkeypatch):
    monkeypatch.setattr(dio, "_has_iceberg", lambda spark: True)
    log = []
    dio.read_transcripts(FakeSession(log), "cat.db.transcripts", snapshot_id=42)
    assert ("format", "iceberg") in log
    assert ("option", "snapshot-id", "42") in log
    assert ("load", "cat.db.transcripts") in log
    assert not any(op == "parquet" for op, *_ in log)
    # the projection to the binding schema still happens
    assert log[-1][0] == "select"


def test_read_iceberg_table_without_snapshot(monkeypatch):
    monkeypatch.setattr(dio, "_has_iceberg", lambda spark: True)
    log = []
    dio.read_transcripts(FakeSession(log), "cat.db.transcripts")
    assert ("format", "iceberg") in log
    assert not any(op == "option" for op, *_ in log)


def test_read_path_falls_back_to_parquet_even_with_iceberg(monkeypatch):
    monkeypatch.setattr(dio, "_has_iceberg", lambda spark: True)
    log = []
    dio.read_transcripts(FakeSession(log), "/data/corpus", snapshot_id=42)
    assert ("parquet", "/data/corpus") in log
    assert not any(op == "format" for op, *_ in log)
    # schema is pinned on the parquet read
    assert any(op == "schema" for op, *_ in log)


def test_read_table_name_without_iceberg_is_parquet(monkeypatch):
    monkeypatch.setattr(dio, "_has_iceberg", lambda spark: False)
    log = []
    dio.read_transcripts(FakeSession(log), "some_table")
    assert ("parquet", "some_table") in log


def test_write_table_iceberg_modes(monkeypatch):
    monkeypatch.setattr(dio, "_has_iceberg", lambda spark: True)
    log = []
    dio.write_table(FakeOutDF(log), "cat.db.out", mode="append")
    assert log == [("writeTo.append", "cat.db.out")]
    log.clear()
    dio.write_table(FakeOutDF(log), "cat.db.out", mode="overwrite")
    assert log == [("writeTo.createOrReplace", "cat.db.out")]


def test_write_table_path_is_parquet(monkeypatch):
    monkeypatch.setattr(dio, "_has_iceberg", lambda spark: True)
    log = []
    dio.write_table(FakeOutDF(log), "/tmp/out", mode="append")
    assert log == [("mode", "append"), ("parquet", "/tmp/out")]


def test_current_snapshot_id_branches(monkeypatch):
    monkeypatch.setattr(dio, "_has_iceberg", lambda spark: True)
    log = []
    sid = dio.current_snapshot_id(FakeSession(log), "cat.db.transcripts")
    assert sid == 1234
    assert any(op == "sql" and "snapshots" in q for op, q in log)
    assert dio.current_snapshot_id(FakeSession([]), "/a/path") is None


def test_has_iceberg_false_in_sandbox(spark):
    # measured truth in this container: no Iceberg jar on the classpath
    assert dio._has_iceberg(spark) is False

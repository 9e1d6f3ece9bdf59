"""Unit tests for the shared self-sizing machinery (operators/sizing.py):
the JVM-size parser (no session needed) and the budget reader's two paths
(conf-set cluster posture vs local-mode driver heap)."""

from __future__ import annotations

from streamds_spark.operators.sizing import mem_budget_bytes, parse_jvm_size


def test_parse_jvm_size_suffixes():
    assert parse_jvm_size("1024k") == 1 << 20
    assert parse_jvm_size("512m") == 512 << 20
    assert parse_jvm_size("8g") == 8 << 30
    assert parse_jvm_size("1.5g") == int(1.5 * (1 << 30))
    assert parse_jvm_size("2t") == 2 << 40
    assert parse_jvm_size("  8G ") == 8 << 30  # case/space tolerant
    assert parse_jvm_size("123456") == 123456  # raw bytes


def test_parse_jvm_size_unset_and_garbage():
    assert parse_jvm_size(None) is None
    assert parse_jvm_size("") is None
    assert parse_jvm_size("lots") is None
    assert parse_jvm_size("g") is None
    assert parse_jvm_size("12q") is None


class _FakeConf:
    def __init__(self, val):
        self._val = val

    def get(self, key, default=None):
        assert key == "spark.executor.memory"
        return self._val


class _FakeSpark:
    def __init__(self, val):
        self.conf = _FakeConf(val)


def test_budget_reader_conf_path():
    # a real cluster sets spark.executor.memory — the reader must honor it
    # without touching the JVM (the fake has no _jvm)
    assert mem_budget_bytes(_FakeSpark("8g")) == 8 << 30
    assert mem_budget_bytes(_FakeSpark("640m")) == 640 << 20


def test_budget_reader_local_mode(spark):
    # unset conf -> the driver JVM's max heap (local mode: driver==executor)
    assert mem_budget_bytes(spark) > 100 << 20


def test_operator_dials_import_shared_values():
    """The operators' pinned dial behavior is unchanged by the extraction
    (the x10-soak-calibrated expectations from test_anf/test_ktruss)."""
    from streamds_spark.operators.anf import M_ANF, _auto_stripes
    from streamds_spark.operators.kcore import ACTIVE_SET_FRACTION
    from streamds_spark.operators.ktruss import _auto_partitions

    gib = 1 << 30
    assert _auto_stripes(2_392_000, 8 * gib) == 1
    # round 12: packed-layout calibration (192M cells/GiB) — the x10 soak
    # completes unstriped; striping engages a decade later (see test_anf)
    assert _auto_stripes(23_920_000, 8 * gib) == 1
    assert _auto_stripes(239_200_000, 8 * gib) == 10
    assert _auto_partitions(1_196_000, 32) == 32
    assert _auto_partitions(11_960_000, 32) == 299
    assert _auto_partitions(10**9, 32) == 4096
    assert 0 < ACTIVE_SET_FRACTION < 1
    assert M_ANF > 0

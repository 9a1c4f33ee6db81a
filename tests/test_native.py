"""Native C++ runtime: build, decode, disorder, journal, checkpoint/resume."""

import os
import zlib

import numpy as np

from dtc_tpu import native
from dtc_tpu.utils.checkpoints import SweepJournal, checkpointed_instance_sweep


def test_native_builds_and_loads():
    assert native.available(), "g++ toolchain present: native lib must build"


def test_crc32_matches_zlib():
    for data in (b"", b"hello", os.urandom(1000)):
        assert native.crc32(data) == (zlib.crc32(data) & 0xFFFFFFFF)


def test_z_expectations_native_vs_numpy():
    rng = np.random.default_rng(0)
    bits = (rng.random((5000, 7)) < 0.3).astype(np.uint8)
    got = native.z_expectations(bits)
    want = 1.0 - 2.0 * bits.mean(axis=0)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_bit_histogram_matches_python():
    rng = np.random.default_rng(1)
    bits = (rng.random((2000, 3)) < 0.5).astype(np.uint8)
    h = native.bit_histogram(bits)
    # independent python histogram
    want = {}
    for row in bits:
        k = "".join(str(int(b)) for b in reversed(row))
        want[k] = want.get(k, 0) + 1
    assert h == want
    assert sum(h.values()) == 2000


def test_native_disorder_distributions():
    hs, phis = native.generate_disorder_native(42, 10, 400)
    assert hs.shape == (400, 10) and phis.shape == (400, 9)
    assert -np.pi <= hs.min() and hs.max() <= np.pi
    assert -1.5 * np.pi <= phis.min() and phis.max() <= -0.5 * np.pi
    assert abs(hs.mean()) < 0.1
    # deterministic
    hs2, _ = native.generate_disorder_native(42, 10, 400)
    np.testing.assert_array_equal(hs, hs2)
    # prethermal mode
    _, pf = native.generate_disorder_native(1, 5, 2, randomphi=0)
    np.testing.assert_allclose(pf, -0.4)


def test_journal_roundtrip_and_crash_safety(tmp_path):
    p = str(tmp_path / "j.bin")
    native.journal_append(p, "a", b"payload-a")
    native.journal_append(p, "b", b"payload-b" * 100)
    recs = native.journal_read(p)
    assert recs == [("a", b"payload-a"), ("b", b"payload-b" * 100)]
    # corrupt a payload byte of record b -> read stops after record a
    blob = bytearray(open(p, "rb").read())
    corrupted = bytearray(blob)
    corrupted[-5] ^= 0xFF
    open(p, "wb").write(bytes(corrupted))
    assert [k for k, _ in native.journal_read(p)] == ["a"]
    # torn tail: truncated header garbage after valid records
    open(p, "wb").write(bytes(blob) + b"DTCJ\x05\x00\x00")
    assert [k for k, _ in native.journal_read(p)] == ["a", "b"]
    # torn mid-record: cut record b's payload short
    open(p, "wb").write(bytes(blob[:-4]))
    assert [k for k, _ in native.journal_read(p)] == ["a"]


def test_sweep_journal_resume(tmp_path):
    p = str(tmp_path / "sweep.bin")
    calls = []

    def compute(i):
        calls.append(i)
        return np.full(4, float(i))

    out1 = checkpointed_instance_sweep(p, 3, compute)
    assert calls == [0, 1, 2]
    # resume: nothing recomputed
    out2 = checkpointed_instance_sweep(p, 3, compute)
    assert calls == [0, 1, 2]
    np.testing.assert_array_equal(out1, out2)
    # extend: only the new instance runs
    out3 = checkpointed_instance_sweep(p, 4, compute)
    assert calls == [0, 1, 2, 3]
    assert out3.shape == (4, 4)


def test_sweep_journal_arrays(tmp_path):
    j = SweepJournal(str(tmp_path / "x.bin"))
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    j.put("k", a)
    j2 = SweepJournal(str(tmp_path / "x.bin"))
    np.testing.assert_array_equal(j2.get("k"), a)

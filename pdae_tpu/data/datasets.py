"""Datasets: LMDB-backed image corpora + MNIST + a synthetic corpus.

Behavioral equivalents of ``/root/reference/dataset/*.py``: identical key
formats, split offsets, crops, resize, hflip augmentation, [-1,1]
normalization, and per-sample dicts with ``x_0`` float and ``gt`` uint8.
Layout is NHWC (TPU-native) instead of torch CHW.

  * CELEBA64: keys ``None-%07d``; crop(top=57,left=25,128x128) then resize;
    splits train/valid/test = 162770/19867/19963 (dataset/celeba64.py)
  * FFHQ: keys ``256-%05d``, 70000 images  (dataset/ffhq.py)
  * CELEBAHQ: keys ``256-%05d``, 30000 images + 40-attribute annotations
    parsed from ``CelebAMask-HQ-attribute-anno.txt`` (dataset/celebahq.py)
  * HORSE / BEDROOM: keys ``256-%07d``, 2000340 / 3033042 images
  * MNIST: raw idx files (torchvision layout), one-hot condition in batch
  * SYNTHETIC: deterministic procedural images for tests/benchmarks
"""

from __future__ import annotations

import gzip
import io
import os
import struct
import threading
from typing import Dict, Optional

import numpy as np

from .lmdb_store import Reader, open_lmdb


def _resize_pil(img, size: int):
    from PIL import Image
    if img.size != (size, size):
        img = img.resize((size, size), Image.BILINEAR)
    return img


def _finalize(img, rng: Optional[np.ndarray], augmentation: bool,
              as_uint8: bool = False):
    """PIL image -> (x_0 float32 [-1,1] HWC, gt uint8 HWC) with optional
    random hflip.  gt rounding matches the reference's
    ``mul(255).add(0.5).clamp`` (dataset/celeba64.py:75).

    ``as_uint8`` (dataset config ``transfer_uint8``) keeps x_0 as the raw
    uint8 pixels so 4x fewer bytes cross host->device; the jitted train
    steps normalize on device with the SAME fp32 op sequence
    (``utils.x0_from_transfer``), so the result is bitwise identical to
    the host float path (tests/test_transfer_diet.py).  Note gt ==
    uint8(arr) exactly: floor(arr/255*255 + 0.5) == arr for every uint8."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if augmentation and rng is not None and rng.random() < 0.5:
        arr = arr[:, ::-1, :]
    if as_uint8:
        return np.ascontiguousarray(arr), np.ascontiguousarray(arr)
    x01 = arr.astype(np.float32) / 255.0
    x_0 = x01 * 2.0 - 1.0
    gt = np.clip(np.floor(x01 * 255.0 + 0.5), 0, 255).astype(np.uint8)
    return x_0, gt


class LMDBImageDataset:
    """Shared LMDB image dataset machinery."""

    key_fmt = "256-%05d"
    length = 0
    crop = None  # (top, left, h, w)

    def __init__(self, config: dict):
        self.config = config
        self.data_path = config["data_path"]
        self.image_size = int(config["image_size"])
        self.image_channel = int(config.get("image_channel", 3))
        self.augmentation = bool(config.get("augmentation", False))
        # native JPEG decode+resize (GIL-free, ~1.3x PIL per core; see
        # data/native_image).  Default ON since round 2 -- falls back to PIL
        # automatically when the .so is absent or input isn't JPEG; pixel
        # parity vs PIL is within +/-1 uint8 step (tests/test_data.py).
        self.fast_decode = bool(config.get("fast_decode", True))
        # transfer_uint8: emit x_0 as raw uint8 (4x fewer host->device
        # bytes; exact -- see _finalize).  Train-dataset option; the
        # samplers' metric paths expect float x_0.
        self.transfer_uint8 = bool(config.get("transfer_uint8", False))
        self._reader: Optional[Reader] = None
        self._reader_lock = threading.Lock()

    def _txn(self) -> Reader:
        # lazy shared open, like the reference's per-worker txn
        # (dataset/celeba64.py:56-57).  The Loader's thread pool hits this
        # concurrently on the first batch; the lock keeps it to ONE open
        # (readers are stateless mmaps, safe to share across threads)
        if self._reader is None:
            with self._reader_lock:
                if self._reader is None:
                    self._reader = open_lmdb(self.data_path)
        return self._reader

    def __len__(self) -> int:
        return self.length

    def _index_key(self, index: int) -> bytes:
        return (self.key_fmt % index).encode("utf-8")

    def _load_image(self, index: int):
        img_bytes = self._txn().get(self._index_key(index))
        if img_bytes is None:
            raise KeyError(f"missing LMDB key {self._index_key(index)!r}")
        if self.fast_decode and self.image_channel == 3:
            from .native_image import available, load_jpeg_resized
            if available():
                arr = load_jpeg_resized(img_bytes, self.image_size,
                                        crop=self.crop)
                if arr is not None:
                    return arr
        from PIL import Image
        img = Image.open(io.BytesIO(img_bytes))
        img = img.convert("RGB" if self.image_channel == 3 else "L")
        if self.crop is not None:
            top, left, h, w = self.crop
            img = img.crop((left, top, left + w, top + h))
        return _resize_pil(img, self.image_size)

    def __getitem__(self, index: int, rng: Optional[np.random.Generator] = None):
        img = self._load_image(index)
        x_0, gt = _finalize(img, rng, self.augmentation, self.transfer_uint8)
        return {"idx": index, "x_0": x_0, "gt": gt}

    @staticmethod
    def collate_fn(batch) -> Dict[str, np.ndarray]:
        return {
            "idx": np.asarray([b["idx"] for b in batch], np.int32),
            "x_0": np.stack([b["x_0"] for b in batch]),
            "gts": np.stack([b["gt"] for b in batch]),
        }


class CELEBA64(LMDBImageDataset):
    key_fmt = "None-%07d"
    crop = (57, 25, 128, 128)
    SPLITS = {"train": (0, 162770), "valid": (162770, 19867),
              "test": (182637, 19963)}

    def __init__(self, config):
        super().__init__(config)
        self.split = config.get("split", "train")
        if self.split not in self.SPLITS:
            raise NotImplementedError(self.split)
        self._offset, self.length = self.SPLITS[self.split]

    def _index_key(self, index: int) -> bytes:
        return (self.key_fmt % (self._offset + index)).encode("utf-8")


class FFHQ(LMDBImageDataset):
    key_fmt = "256-%05d"
    length = 70000


class CELEBAHQ(LMDBImageDataset):
    key_fmt = "256-%05d"
    length = 30000

    ID_TO_LABEL = [
        "5_o_Clock_Shadow", "Arched_Eyebrows", "Attractive", "Bags_Under_Eyes",
        "Bald", "Bangs", "Big_Lips", "Big_Nose", "Black_Hair", "Blond_Hair",
        "Blurry", "Brown_Hair", "Bushy_Eyebrows", "Chubby", "Double_Chin",
        "Eyeglasses", "Goatee", "Gray_Hair", "Heavy_Makeup", "High_Cheekbones",
        "Male", "Mouth_Slightly_Open", "Mustache", "Narrow_Eyes", "No_Beard",
        "Oval_Face", "Pale_Skin", "Pointy_Nose", "Receding_Hairline",
        "Rosy_Cheeks", "Sideburns", "Smiling", "Straight_Hair", "Wavy_Hair",
        "Wearing_Earrings", "Wearing_Hat", "Wearing_Lipstick",
        "Wearing_Necklace", "Wearing_Necktie", "Young",
    ]
    LABEL_TO_ID = {v: k for k, v in enumerate(ID_TO_LABEL)}

    def __init__(self, config):
        super().__init__(config)
        anno = os.path.join(self.data_path, "CelebAMask-HQ-attribute-anno.txt")
        self._labels = None
        if os.path.exists(anno):
            self._labels = self._parse_annotations(anno)
        elif config.get("require_annotations", True):
            # the reference crashes on the missing file (celebahq.py:36);
            # training a classifier on silent zero labels would "work"
            raise FileNotFoundError(
                f"{anno} not found; set require_annotations: false to load "
                f"images without attribute labels")

    @staticmethod
    def _parse_annotations(path: str) -> np.ndarray:
        """Parse the 40-attribute +1/-1 table (dataset/celebahq.py:36-38)."""
        with open(path) as f:
            f.readline()                 # count line
            f.readline()                 # header line
            rows = []
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                rows.append([int(v) for v in parts[1:41]])
        return np.asarray(rows, np.int32)

    def __getitem__(self, index, rng=None):
        out = super().__getitem__(index, rng)
        if self._labels is not None:
            out["label"] = self._labels[index]
        else:
            out["label"] = np.zeros((40,), np.int32)
        return out

    @staticmethod
    def collate_fn(batch):
        out = LMDBImageDataset.collate_fn(batch)
        out["label"] = np.stack([b["label"] for b in batch])
        return out


class HORSE(LMDBImageDataset):
    key_fmt = "256-%07d"
    length = 2000340


class BEDROOM(LMDBImageDataset):
    key_fmt = "256-%07d"
    length = 3033042


class MNIST:
    """MNIST from raw idx files (no torchvision dependency).

    Looks for ``train-images-idx3-ubyte[.gz]`` etc. under ``data_path`` or
    ``data_path/MNIST/raw``.  Resized to ``image_size`` (bilinear, like the
    reference's transforms.Resize), one-hot condition added at collate
    (dataset/mnist.py:60).
    """

    def __init__(self, config):
        self.config = config
        self.image_size = int(config["image_size"])
        self.train = bool(config.get("train", True))
        self.transfer_uint8 = bool(config.get("transfer_uint8", False))
        base = config["data_path"]
        prefix = "train" if self.train else "t10k"
        self.images, self.labels = self._load_idx(base, prefix)

    @staticmethod
    def _open_maybe_gz(path):
        if os.path.exists(path):
            return open(path, "rb")
        if os.path.exists(path + ".gz"):
            return gzip.open(path + ".gz", "rb")
        return None

    @classmethod
    def _load_idx(cls, base: str, prefix: str):
        for root in (base, os.path.join(base, "MNIST", "raw")):
            fi = cls._open_maybe_gz(os.path.join(root, f"{prefix}-images-idx3-ubyte"))
            fl = cls._open_maybe_gz(os.path.join(root, f"{prefix}-labels-idx1-ubyte"))
            if fi is not None and fl is not None:
                with fi, fl:
                    magic, n, rows, cols = struct.unpack(">IIII", fi.read(16))
                    assert magic == 2051, magic
                    images = np.frombuffer(fi.read(n * rows * cols),
                                           np.uint8).reshape(n, rows, cols)
                    magic, n2 = struct.unpack(">II", fl.read(8))
                    assert magic == 2049, magic
                    labels = np.frombuffer(fl.read(n2), np.uint8)
                return images, labels
        raise FileNotFoundError(
            f"MNIST idx files not found under {base} (expected "
            f"{prefix}-images-idx3-ubyte[.gz])")

    def __len__(self):
        return self.images.shape[0]

    def __getitem__(self, index, rng=None):
        from PIL import Image
        img = Image.fromarray(self.images[index])
        img = _resize_pil(img, self.image_size)
        x_0, gt = _finalize(img, None, False, self.transfer_uint8)
        return {"idx": index, "x_0": x_0, "gt": gt,
                "label": int(self.labels[index])}

    @staticmethod
    def collate_fn(batch):
        labels = np.asarray([b["label"] for b in batch], np.int32)
        onehot = np.zeros((len(batch), 10), np.float32)
        onehot[np.arange(len(batch)), labels] = 1.0
        return {
            "idx": np.asarray([b["idx"] for b in batch], np.int32),
            "x_0": np.stack([b["x_0"] for b in batch]),
            "gts": np.stack([b["gt"] for b in batch]),
            "label": labels,
            "condition": labels,      # int class ids for nn.Embed
            "condition_onehot": onehot,
        }


class SYNTHETIC:
    """Deterministic procedural image dataset for tests and benchmarks."""

    def __init__(self, config):
        self.image_size = int(config["image_size"])
        self.image_channel = int(config.get("image_channel", 3))
        self.length = int(config.get("length", 256))
        self.num_class = int(config.get("num_class", 10))
        # multilabel=N emits +/-1 attribute vectors of size N (CelebA-HQ
        # style) instead of int class ids
        self.multilabel = int(config.get("multilabel", 0))
        # transfer_uint8: unlike the image datasets (where it is exact),
        # synthetic x_0 is float-born, so this swaps in the quantized gt
        # (1/255-step numerics change) -- benchmark/smoke use only.
        self.transfer_uint8 = bool(config.get("transfer_uint8", False))
        # preload: generate every item once at construction.  Benchmarks
        # use this to emulate a host whose input pipeline keeps up with
        # the device (real TPU hosts have >100 vCPUs; this VM has 1 --
        # per-item procedural generation is the bottleneck otherwise).
        self._cache = None
        if config.get("preload", False):
            self._cache = [self._generate(i) for i in range(self.length)]

    def __len__(self):
        return self.length

    def __getitem__(self, index, rng=None):
        if self._cache is not None:
            return self._cache[index]
        return self._generate(index)

    def _generate(self, index):
        rs = np.random.RandomState(index)
        base = rs.rand(8, 8, self.image_channel).astype(np.float32)
        # smooth upsample to image_size
        reps = self.image_size // 8
        img = np.kron(base, np.ones((reps, reps, 1), np.float32))
        gt = np.clip(np.floor(img * 255.0 + 0.5), 0, 255).astype(np.uint8)
        x_0 = gt if self.transfer_uint8 else img * 2.0 - 1.0
        if self.multilabel:
            label = (rs.randint(0, 2, (self.multilabel,)) * 2 - 1).astype(
                np.int32)
        else:
            label = index % self.num_class
        return {"idx": index, "x_0": x_0, "gt": gt, "label": label}

    @staticmethod
    def collate_fn(batch):
        labels = np.asarray([b["label"] for b in batch], np.int32)
        return {
            "idx": np.asarray([b["idx"] for b in batch], np.int32),
            "x_0": np.stack([b["x_0"] for b in batch]),
            "gts": np.stack([b["gt"] for b in batch]),
            "label": labels,
            "condition": labels,
        }


REGISTRY = {
    "CELEBA64": CELEBA64,
    "FFHQ": FFHQ,
    "CELEBAHQ": CELEBAHQ,
    "HORSE": HORSE,
    "BEDROOM": BEDROOM,
    "MNIST": MNIST,
    "SYNTHETIC": SYNTHETIC,
}


def build_dataset(config: dict):
    """Registry-string dataset construction (dataset/__init__.py:1-6)."""
    return REGISTRY[config["name"]](config)

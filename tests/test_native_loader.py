"""Native runtime (libpng decode + CSV parse) vs the PIL/numpy oracles."""

import os

import numpy as np
import pytest

from cova_tpu.data import native_loader
from cova_tpu.data.dataset import WebDataset, _load_csv
from cova_tpu.data.synthetic import materialize

pytestmark = pytest.mark.skipif(
    not native_loader.ensure_built(),
    reason="native library not built and no toolchain",
)


@pytest.fixture(scope="module")
def disk_ds(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("native_data"))
    ids = materialize(out, n_pages=4, img_h=48, seed=3, min_boxes=5,
                      max_boxes=12)
    return out, ids


def test_decode_matches_pil(disk_ds):
    from PIL import Image

    root, ids = disk_ds
    for i in ids:
        path = os.path.join(root, "imgs", f"{i}.png")
        want = np.asarray(Image.open(path).convert("RGB"))
        got = native_loader.decode_png(path, 48, 48)
        np.testing.assert_array_equal(got, want)


def test_decode_batch_threaded(disk_ds):
    from PIL import Image

    root, ids = disk_ds
    paths = [os.path.join(root, "imgs", f"{i}.png") for i in ids]
    got = native_loader.decode_png_batch(paths, 48, 48, nthreads=3)
    for k, p in enumerate(paths):
        want = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(got[k], want)


def test_decode_pads_and_crops(disk_ds):
    from PIL import Image

    root, ids = disk_ds
    path = os.path.join(root, "imgs", f"{ids[0]}.png")
    want = np.asarray(Image.open(path).convert("RGB"))
    bigger = native_loader.decode_png(path, 64, 64)
    np.testing.assert_array_equal(bigger[:48, :48], want)
    assert (bigger[48:] == 0).all() and (bigger[:, 48:] == 0).all()
    smaller = native_loader.decode_png(path, 32, 32)
    np.testing.assert_array_equal(smaller, want[:32, :32])


def test_decode_palette_trns_matches_pil(tmp_path):
    """Palette PNG with a tRNS transparency chunk: the decoder must ignore
    tRNS exactly like PIL's convert("RGB") does (regression: the expansion
    to RGBA used to channel-shift every pixel)."""
    from PIL import Image

    img = Image.new("P", (16, 16))
    palette = []
    for i in range(256):
        palette += [i, (i * 3) % 256, 255 - i]
    img.putpalette(palette)
    px = img.load()
    for y in range(16):
        for x in range(16):
            px[x, y] = (x + 16 * y) % 256
    path = str(tmp_path / "pal_trns.png")
    img.save(path, transparency=0)

    want = np.asarray(Image.open(path).convert("RGB"))
    got = native_loader.decode_png(path, 16, 16)
    np.testing.assert_array_equal(got, want)


def test_decode_gray_trns_matches_pil(tmp_path):
    from PIL import Image

    img = Image.new("L", (12, 12))
    px = img.load()
    for y in range(12):
        for x in range(12):
            px[x, y] = (17 * x + 5 * y) % 256
    path = str(tmp_path / "gray_trns.png")
    img.save(path, transparency=128)

    want = np.asarray(Image.open(path).convert("RGB"))
    got = native_loader.decode_png(path, 12, 12)
    np.testing.assert_array_equal(got, want)


def test_csv_matches_numpy(disk_ds):
    root, ids = disk_ds
    for i in ids:
        path = os.path.join(root, "bboxes", f"{i}.csv")
        want = _load_csv(path)
        got = native_loader.parse_bbox_csv(path)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_missing_file_errors():
    with pytest.raises(IOError):
        native_loader.decode_png("/nonexistent/x.png", 8, 8)
    with pytest.raises(IOError):
        native_loader.parse_bbox_csv("/nonexistent/x.csv")


def test_webdataset_native_path(disk_ds):
    root, ids = disk_ds
    ds_native = WebDataset(root, ids, img_size=48, use_native=True)
    ds_py = WebDataset(root, ids, use_native=False)
    assert ds_native.use_native
    for k in range(len(ids)):
        np.testing.assert_allclose(
            ds_native.all_boxes[k], ds_py.all_boxes[k]
        )
        np.testing.assert_array_equal(
            ds_native.all_labels[k], ds_py.all_labels[k]
        )
        np.testing.assert_array_equal(ds_native.image(k), ds_py.image(k))


def test_pipeline_native_batch_path(disk_ds):
    """DataPipeline routes whole-batch decode through the C++ pool when the
    dataset is native-backed with a known size."""
    from cova_tpu.data.pipeline import DataPipeline

    root, ids = disk_ds
    ds = WebDataset(root, ids, img_size=48, use_native=True)
    p = DataPipeline(ds, batch_size=2, pad_boxes=16, context_size=2,
                     num_threads=2)
    ds_py = WebDataset(root, ids, use_native=False)
    p_py = DataPipeline(ds_py, batch_size=2, pad_boxes=16, context_size=2,
                        num_threads=2)
    for (ids_a, ba), (ids_b, bb) in zip(p.epoch(0), p_py.epoch(0)):
        assert ids_a == ids_b
        np.testing.assert_array_equal(ba.images, bb.images)
        np.testing.assert_array_equal(ba.boxes, bb.boxes)
        np.testing.assert_array_equal(ba.context_indices, bb.context_indices)


def test_decode_batch_s2d4(disk_ds):
    """s2d4=True emits the TPU input layout [n, h/4, w/4, 48], equal to the
    host-side numpy transform of the plain decode."""
    from cova_tpu.ops.conv_stem import s2d4_host

    root, ids = disk_ds
    paths = [os.path.join(root, "imgs", f"{i}.png") for i in ids]
    plain = native_loader.decode_png_batch(paths, 48, 48, nthreads=2)
    s2d = native_loader.decode_png_batch(paths, 48, 48, nthreads=2,
                                         s2d4=True)
    assert s2d.shape == (len(ids), 12, 12, 48)
    want = np.stack([s2d4_host(im) for im in plain], 0)
    np.testing.assert_array_equal(s2d, want)

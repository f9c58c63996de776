"""TensorBoard event-writer round-trip, validated with tensorboard's own
event-file reader (the format consumer the reference's SummaryWriter logs
target — tools/trainer.py:111-128)."""

import numpy as np
import pytest

from pose_estimation_tpu.utils.tb import EventWriter, _encode_png, crc32c

tb_loader = pytest.importorskip(
    "tensorboard.backend.event_processing.event_file_loader")


def _load_events(path):
    return list(tb_loader.LegacyEventFileLoader(path).Load())


def test_crc32c_known_vectors():
    # RFC 3720 test vectors for CRC32C (Castagnoli)
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_scalar_roundtrip(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_scalar("loss/total", 1.5, 7)
    w.add_scalar("lr", 1e-4, 8)
    w.flush()
    events = _load_events(w.path)
    assert events[0].file_version == "brain.Event:2"
    scalars = [(e.step, v.tag, v.simple_value)
               for e in events[1:] for v in e.summary.value]
    assert scalars[0] == (7, "loss/total", 1.5)
    assert scalars[1][0:2] == (8, "lr")
    assert abs(scalars[1][2] - 1e-4) < 1e-9


def test_image_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (17, 23, 3), np.uint8)
    w = EventWriter(str(tmp_path))
    w.add_image("eval/grid", img, 3)
    w.flush()
    (ev,) = _load_events(w.path)[1:]
    val = ev.summary.value[0]
    assert val.tag == "eval/grid"
    assert (val.image.height, val.image.width,
            val.image.colorspace) == (17, 23, 3)
    png = val.image.encoded_image_string
    assert png.startswith(b"\x89PNG")
    # decode the PNG independently (cv2) and compare pixels
    cv2 = pytest.importorskip("cv2")
    dec = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)
    assert dec is not None
    np.testing.assert_array_equal(dec[..., ::-1], img)  # BGR -> RGB


def test_png_grayscale():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    png = _encode_png(img)
    cv2 = pytest.importorskip("cv2")
    dec = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(dec, img)


def test_metrics_logger_mirrors_tb(tmp_path):
    from pose_estimation_tpu.train.trainer import MetricsLogger

    log = MetricsLogger(str(tmp_path), "train")
    log.log(1, {"loss": 2.0, "note": "strings are jsonl-only"})
    log.log(2, {"loss": 1.0})
    tb_dir = tmp_path / "tb" / "train"
    files = list(tb_dir.glob("events.out.tfevents.*"))
    assert len(files) == 1
    events = _load_events(str(files[0]))
    scalars = [(e.step, v.tag, v.simple_value)
               for e in events[1:] for v in e.summary.value]
    assert (1, "loss", 2.0) in scalars
    assert (2, "loss", 1.0) in scalars
    # non-scalar payload entries stay JSONL-only
    assert not any(t == "note" for _, t, _ in scalars)

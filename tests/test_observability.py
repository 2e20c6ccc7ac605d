"""TensorBoard event writer + run-history observability tests.

The reference tensorboards scalars via torch SummaryWriter
(train_backbone.py:73-83,291-296); ours is a dependency-free TFRecord/
Event-proto writer (utils/tensorboard.py). These tests parse the written
file back with an independent minimal reader (framing CRCs verified) so
a `tensorboard --logdir` load is representative.
"""

import json
import struct

import numpy as np
import pytest

from dat_segmentation_tpu.utils.tensorboard import (
    SummaryWriter,
    _masked_crc,
    crc32c,
)


def test_crc32c_vectors():
    # RFC 3720 / common Castagnoli test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"a") == 0xC1D04330


def _read_records(path):
    """Independent TFRecord reader with CRC verification."""
    out = []
    data = path.read_bytes()
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        header = data[off : off + 8]
        (hcrc,) = struct.unpack_from("<I", data, off + 8)
        assert hcrc == _masked_crc(header), "header CRC mismatch"
        payload = data[off + 12 : off + 12 + length]
        (pcrc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert pcrc == _masked_crc(payload), "payload CRC mismatch"
        out.append(payload)
        off += 12 + length + 4
    return out


def _parse_varint(buf, off):
    val = shift = 0
    while True:
        b = buf[off]
        off += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, off
        shift += 7


def _parse_fields(buf):
    """Flat (field_num, wire_type, value) list for one proto message."""
    out = []
    off = 0
    while off < len(buf):
        key, off = _parse_varint(buf, off)
        num, wt = key >> 3, key & 7
        if wt == 0:
            val, off = _parse_varint(buf, off)
        elif wt == 1:
            val = struct.unpack_from("<d", buf, off)[0]
            off += 8
        elif wt == 2:
            ln, off = _parse_varint(buf, off)
            val = buf[off : off + ln]
            off += ln
        elif wt == 5:
            val = struct.unpack_from("<f", buf, off)[0]
            off += 4
        else:  # pragma: no cover
            raise AssertionError(f"wire type {wt}")
        out.append((num, wt, val))
    return out


def _decode_scalars(event_payload):
    """{tag: value}, step from one Event proto."""
    step, scalars = 0, {}
    for num, _, val in _parse_fields(event_payload):
        if num == 2:
            step = val
        elif num == 5:  # summary
            for vnum, _, vval in _parse_fields(val):
                if vnum == 1:  # Summary.value
                    tag, sv = None, None
                    for fnum, _, fval in _parse_fields(vval):
                        if fnum == 1:
                            tag = fval.decode()
                        elif fnum == 2:
                            sv = fval
                    scalars[tag] = sv
    return step, scalars


def test_event_file_roundtrip(tmp_path):
    w = SummaryWriter(tmp_path)
    w.add_scalar("loss", 1.5, step=10)
    w.add_scalars_dict({"lr": 6e-5, "miou": 0.493}, step=20)
    w.close()

    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    assert len(records) == 3  # file_version + 2 scalar events

    # record 0: file_version
    fields = _parse_fields(records[0])
    assert any(n == 3 and v == b"brain.Event:2" for n, _, v in fields)

    step, scalars = _decode_scalars(records[1])
    assert step == 10
    assert scalars == {"loss": pytest.approx(1.5)}

    step, scalars = _decode_scalars(records[2])
    assert step == 20
    assert scalars["lr"] == pytest.approx(6e-5)
    assert scalars["miou"] == pytest.approx(0.493, rel=1e-6)


def test_metric_logger_writes_tb_and_jsonl(tmp_path):
    from dat_segmentation_tpu.utils.logging import MetricLogger

    logger = MetricLogger(tmp_path / "run" / "train.log", quiet=True)
    logger.scalars(5, loss=2.0, lr=1e-4)
    logger.scalars(10, loss=1.0, lr=9e-5, val_miou=0.4)
    logger.close()

    lines = [
        json.loads(ln)
        for ln in (tmp_path / "run" / "train.scalars.jsonl")
        .read_text()
        .splitlines()
    ]
    assert [ln["step"] for ln in lines] == [5, 10]

    ev_files = list((tmp_path / "run" / "tb").glob("events.out.tfevents.*"))
    assert len(ev_files) == 1
    records = _read_records(ev_files[0])
    steps_scalars = [_decode_scalars(r) for r in records[1:]]
    assert steps_scalars[0][0] == 5
    assert steps_scalars[0][1]["loss"] == pytest.approx(2.0)
    assert steps_scalars[1][1]["val_miou"] == pytest.approx(0.4)


def test_weight_stats_on_device_matches_host():
    from dat_segmentation_tpu.utils.logging import (
        weight_stats,
        weight_stats_on_device,
    )

    rng = np.random.RandomState(0)
    params = {
        "layer": {"kernel": rng.randn(8, 16).astype(np.float32)},
        "bias": rng.randn(16).astype(np.float32),
    }
    host = weight_stats(params)
    dev = weight_stats_on_device(params)
    assert set(host) == set(dev)
    for name in host:
        for key in ("mean", "std", "l2"):
            assert dev[name][key] == pytest.approx(host[name][key], rel=1e-5)


def test_dataloader_warns_on_frozen_epoch_reuse():
    from dat_segmentation_tpu.data.loader import DataLoader

    class _DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"x": np.zeros(1)}

    ds = _DS()
    DataLoader(ds, 2, shuffle=True, seed=123)  # first epoch-0 loader: fine
    with pytest.warns(UserWarning, match="epoch="):
        DataLoader(ds, 2, shuffle=True, seed=123)  # frozen aug stream
    # advancing the epoch is the documented contract — no warning
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        DataLoader(ds, 2, shuffle=True, seed=123, epoch=1)


def test_tb_export_cli_converts_jsonl(tmp_path, monkeypatch):
    """tools/tb_export.py retroactively converts a scalars JSONL (e.g. a
    run recorded with tensorboard=False) into a loadable event file."""
    import runpy

    src = tmp_path / "train.scalars.jsonl"
    src.write_text(
        json.dumps({"step": 50, "time": 1.0, "loss": 2.5, "lr": 6e-5})
        + "\n\n"  # blank lines are skipped
        + json.dumps({"step": 100, "loss": 1.25, "note": "str skipped"})
        + "\n"
    )
    monkeypatch.setattr("sys.argv", ["tb_export.py", str(src)])
    runpy.run_path("tools/tb_export.py", run_name="__main__")

    ev_files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert len(ev_files) == 1
    records = _read_records(ev_files[0])
    steps_scalars = [_decode_scalars(r) for r in records[1:]]
    assert steps_scalars[0][0] == 50
    assert steps_scalars[0][1]["loss"] == pytest.approx(2.5)
    assert steps_scalars[0][1]["lr"] == pytest.approx(6e-5)
    assert "time" not in steps_scalars[0][1]
    assert steps_scalars[1][0] == 100
    assert set(steps_scalars[1][1]) == {"loss"}

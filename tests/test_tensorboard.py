"""Tests for the dependency-free tfevents writer (training/tensorboard.py).

The fast path decodes the TFRecord framing + Event protos with a local
parser (including crc32c verification against known vectors). Set
MGT_TB_CROSSCHECK=1 to additionally parse the file with TensorBoard's own
event_file_loader (imports TensorFlow; ~1 min, so off by default)."""

import glob
import os
import struct

import numpy as np

from morphganformer_tpu.training.tensorboard import (
    EventWriter,
    _masked_crc,
    crc32c,
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC32C (Castagnoli).
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header), "header crc mismatch"
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == _masked_crc(data), "data crc mismatch"
            records.append(data)
    return records


def _parse_proto(data):
    """Tiny wire-format parser: returns {field: [raw values]}."""
    fields = {}
    i = 0
    while i < len(data):
        key = 0
        shift = 0
        while True:
            b = data[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = data[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            v = struct.unpack("<d", data[i:i + 8])[0]
            i += 8
        elif wire == 5:
            v = struct.unpack("<f", data[i:i + 4])[0]
            i += 4
        elif wire == 2:
            n = 0
            shift = 0
            while True:
                b = data[i]
                i += 1
                n |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = data[i:i + n]
            i += n
        else:
            raise AssertionError(f"wire type {wire}")
        fields.setdefault(field, []).append(v)
    return fields


def test_event_file_round_trip(tmp_path):
    with EventWriter(str(tmp_path)) as w:
        w.add_scalars(10, {"Loss/G/loss": 1.5, "Loss/D/loss": 0.25})
        w.add_scalars(20, {"Loss/G/loss": 1.0})

    files = glob.glob(os.path.join(tmp_path, "events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    assert len(records) == 3  # file_version + 2 scalar events

    header = _parse_proto(records[0])
    assert header[3] == [b"brain.Event:2"]

    ev1 = _parse_proto(records[1])
    assert ev1[2] == [10]  # step
    values = [_parse_proto(v) for v in _parse_proto(ev1[5][0])[1]]
    tags = {v[1][0].decode(): v[2][0] for v in values}
    np.testing.assert_allclose(tags["Loss/G/loss"], 1.5)
    np.testing.assert_allclose(tags["Loss/D/loss"], 0.25)

    ev2 = _parse_proto(records[2])
    assert ev2[2] == [20]

    if os.environ.get("MGT_TB_CROSSCHECK") == "1":
        from tensorboard.backend.event_processing import event_file_loader
        events = list(event_file_loader.EventFileLoader(files[0]).Load())
        assert len(events) == 3
        assert events[1].step == 10
        # Newer loaders migrate simple_value -> rank-0 tensor (data_compat).
        got = {v.tag: (v.simple_value if v.HasField("simple_value")
                       else v.tensor.float_val[0])
               for v in events[1].summary.value}
        np.testing.assert_allclose(got["Loss/G/loss"], 1.5)

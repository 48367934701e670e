"""TensorBoard event-file writer (utils/tb_events.py): framing CRCs against
the public crc32c test vector and a full decode round-trip with an
independent in-test parser (tensorflow/tensorboardX are absent here, so the
reader side is re-derived from the TFRecord + proto wire specs)."""

import struct

import numpy as np

from muscle_tpu.utils.tb_events import EventWriter, _masked_crc, crc32c


def test_crc32c_known_vector():
    # RFC 3720 / the canonical crc32c check value
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def _read_records(path):
    data = open(path, "rb").read()
    off = 0
    out = []
    while off < len(data):
        (n,) = struct.unpack_from("<Q", data, off)
        (hcrc,) = struct.unpack_from("<I", data, off + 8)
        assert hcrc == _masked_crc(data[off : off + 8])
        rec = data[off + 12 : off + 12 + n]
        (dcrc,) = struct.unpack_from("<I", data, off + 12 + n)
        assert dcrc == _masked_crc(rec)
        out.append(rec)
        off += 12 + n + 4
    return out


def _parse_fields(buf):
    """proto wire format -> {field: [values]} (varint/fixed64/bytes/fixed32)."""
    fields = {}
    off = 0
    while off < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[off]
            off += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = buf[off]
                off += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            v = struct.unpack_from("<d", buf, off)[0]
            off += 8
        elif wire == 2:
            n = 0
            shift = 0
            while True:
                b = buf[off]
                off += 1
                n |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[off : off + n]
            off += n
        elif wire == 5:
            v = struct.unpack_from("<f", buf, off)[0]
            off += 4
        else:
            raise AssertionError(f"wire type {wire}")
        fields.setdefault(field, []).append(v)
    return fields


def test_scalar_and_image_roundtrip(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_scalar("loss/total", 1.5, global_step=3)
    w.add_scalar("loss/total", 0.75, global_step=4)
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    w.add_image("vis/cam", img, global_step=4)
    w.close()

    recs = _read_records(w.path)
    assert len(recs) == 4  # file_version + 2 scalars + 1 image

    head = _parse_fields(recs[0])
    assert head[3] == [b"brain.Event:2"]

    ev1 = _parse_fields(recs[1])
    assert ev1[2] == [3]  # step
    val1 = _parse_fields(_parse_fields(ev1[5][0])[1][0])
    assert val1[1] == [b"loss/total"]
    assert abs(val1[2][0] - 1.5) < 1e-7

    ev2 = _parse_fields(recs[2])
    val2 = _parse_fields(_parse_fields(ev2[5][0])[1][0])
    assert abs(val2[2][0] - 0.75) < 1e-7

    ev3 = _parse_fields(recs[3])
    val3 = _parse_fields(_parse_fields(ev3[5][0])[1][0])
    assert val3[1] == [b"vis/cam"]
    im = _parse_fields(val3[4][0])
    assert im[1] == [4] and im[2] == [6] and im[3] == [3]
    import io

    from PIL import Image

    decoded = np.asarray(Image.open(io.BytesIO(im[4][0])))
    np.testing.assert_array_equal(decoded, img)


def test_float_image_and_grayscale(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_image("g", np.linspace(0, 1, 12, dtype=np.float32).reshape(3, 4))
    w.close()
    recs = _read_records(w.path)
    ev = _parse_fields(recs[1])
    im = _parse_fields(_parse_fields(_parse_fields(ev[5][0])[1][0])[4][0])
    assert im[1] == [3] and im[2] == [4]

"""TensorBoard event-file writer: framing + protobuf round-trip.

The parser here is written independently from the writer (reads TFRecord
framing, verifies both CRCs, walks the Event/Summary protos field by
field) so the test fails if either side mis-encodes.
"""

import struct

import numpy as np

from dasr_tpu.utils.tb_writer import TBWriter, crc32c, masked_crc32c


def _read_varint(buf, i):
    shift, val = 0, 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _parse_fields(buf):
    """proto bytes -> list of (field, wire, value)."""
    out, i = [], 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, i = _read_varint(buf, i)
        elif wire == 1:
            val = buf[i : i + 8]
            i += 8
        elif wire == 2:
            n, i = _read_varint(buf, i)
            val = buf[i : i + n]
            i += n
        elif wire == 5:
            val = buf[i : i + 4]
            i += 4
        else:  # pragma: no cover
            raise AssertionError(f"unexpected wire type {wire}")
        out.append((field, wire, val))
    return out


def _read_records(path):
    recs = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                return recs
            (n,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == masked_crc32c(header)
            data = f.read(n)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == masked_crc32c(data)
            recs.append(data)


def test_crc32c_known_values():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(bytes(range(32))) == 0x46DD794E
    assert crc32c(b"123456789") == 0xE3069283


def test_scalar_and_image_roundtrip(tmp_path):
    w = TBWriter(str(tmp_path))
    w.add_scalar("loss/g", 0.125, step=7)
    img = (np.arange(4 * 6 * 3).reshape(4, 6, 3) % 256).astype(np.uint8)
    w.add_image("val/sr", img, step=9)
    w.close()

    recs = _read_records(w.path)
    assert len(recs) == 3

    # record 0: file_version
    fields = dict((f, v) for f, _, v in _parse_fields(recs[0]))
    assert fields[3] == b"brain.Event:2"

    # record 1: scalar event
    ev = _parse_fields(recs[1])
    by_field = {f: v for f, _, v in ev}
    assert struct.unpack("<d", by_field[1])[0] > 0  # wall_time
    assert by_field[2] == 7  # step
    summary = _parse_fields(by_field[5])
    value = _parse_fields(summary[0][2])
    vmap = {f: v for f, _, v in value}
    assert vmap[1] == b"loss/g"
    assert struct.unpack("<f", vmap[2])[0] == 0.125

    # record 2: image event
    ev = {f: v for f, _, v in _parse_fields(recs[2])}
    assert ev[2] == 9
    value = {f: v for f, _, v in _parse_fields(_parse_fields(ev[5])[0][2])}
    assert value[1] == b"val/sr"
    image = {f: v for f, _, v in _parse_fields(value[4])}
    assert image[1] == 4 and image[2] == 6 and image[3] == 3
    png = image[4]
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # decode the PNG back (PIL is in the image) and compare pixels
    import io

    from PIL import Image

    back = np.asarray(Image.open(io.BytesIO(png)))
    np.testing.assert_array_equal(back, img)


def test_float_image_conversion(tmp_path):
    w = TBWriter(str(tmp_path))
    w.add_image("x", np.full((2, 2), 0.5, np.float32), step=0)
    w.close()
    recs = _read_records(w.path)
    value = {
        f: v
        for f, _, v in _parse_fields(
            _parse_fields({f: v for f, _, v in _parse_fields(recs[1])}[5])[0][2]
        )
    }
    image = {f: v for f, _, v in _parse_fields(value[4])}
    assert image[3] == 1  # grayscale colorspace
    import io

    from PIL import Image

    back = np.asarray(Image.open(io.BytesIO(image[4])))
    assert back.shape == (2, 2) and int(back[0, 0]) == 128

"""Native DICOM reader (ref ingests DICOM via MONAI LoadImage,
``processors/_base.py:104-180``). Synthetic part-10 files are written with
both supported transfer syntaxes and read back."""
import struct
from pathlib import Path

import numpy as np
import pytest

from mmmm_tpu.preprocess.dicom import read_dicom_file, read_dicom_series

_EXPLICIT = "1.2.840.10008.1.2.1"
_IMPLICIT = "1.2.840.10008.1.2"


def _el_explicit(group, elem, vr, value: bytes) -> bytes:
    head = struct.pack("<HH", group, elem) + vr
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT", b"OF"):
        return head + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + struct.pack("<H", len(value)) + value


def _el_implicit(group, elem, value: bytes) -> bytes:
    return struct.pack("<HH", group, elem) + struct.pack("<I", len(value)) + value


def _pad(s: str) -> bytes:
    b = s.encode()
    return b + (b"\x00" if len(b) % 2 else b"")


def write_dicom(path: Path, pixels: np.ndarray, *, syntax=_EXPLICIT,
                instance=1, ipp=None, iop=None, slope=1.0, intercept=0.0):
    rows, cols = pixels.shape
    meta = b"".join([
        _el_explicit(0x0002, 0x0001, b"OB", b"\x00\x01"),
        _el_explicit(0x0002, 0x0010, b"UI", _pad(syntax)),
    ])
    el = (lambda g, e, vr, v: _el_explicit(g, e, vr, v)) if syntax == _EXPLICIT \
        else (lambda g, e, vr, v: _el_implicit(g, e, v))
    body = [
        el(0x0008, 0x0060, b"CS", _pad("CT")),
        el(0x0018, 0x0050, b"DS", _pad("2.5")),
        el(0x0020, 0x0013, b"IS", _pad(str(instance))),
    ]
    if ipp is not None:
        body.append(el(0x0020, 0x0032, b"DS", _pad("\\".join(map(str, ipp)))))
    if iop is not None:
        body.append(el(0x0020, 0x0037, b"DS", _pad("\\".join(map(str, iop)))))
    body += [
        el(0x0028, 0x0002, b"US", struct.pack("<H", 1)),
        el(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        el(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        el(0x0028, 0x0030, b"DS", _pad("0.7\\0.8")),
        el(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        el(0x0028, 0x0103, b"US", struct.pack("<H", 1)),
        el(0x0028, 0x1052, b"DS", _pad(str(intercept))),
        el(0x0028, 0x1053, b"DS", _pad(str(slope))),
        el(0x7FE0, 0x0010, b"OW", pixels.astype("<i2").tobytes()),
    ]
    path.write_bytes(b"\x00" * 128 + b"DICM" + meta + b"".join(body))


@pytest.mark.parametrize("syntax", [_EXPLICIT, _IMPLICIT])
def test_read_single_file_rescale(tmp_path, syntax):
    px = np.arange(12, dtype=np.int16).reshape(3, 4)
    f = tmp_path / "a.dcm"
    write_dicom(f, px, syntax=syntax, slope=2.0, intercept=-1024.0)
    arr, meta = read_dicom_file(f)
    assert arr.shape == (3, 4)
    np.testing.assert_allclose(arr, px * 2.0 - 1024.0)
    assert meta["PixelSpacing"] == [0.7, 0.8]
    assert meta["Modality"] == "CT"


def test_series_sorted_by_position_not_filename(tmp_path):
    iop = [1, 0, 0, 0, 1, 0]  # axial: normal = +z
    # filenames reversed vs z position; reader must sort by IPP projection
    for name, z, fill in [("b.dcm", 5.0, 1), ("a.dcm", 10.0, 2), ("c.dcm", 0.0, 0)]:
        write_dicom(tmp_path / name, np.full((2, 2), fill, np.int16),
                    ipp=[0, 0, z], iop=iop)
    vol, spacing = read_dicom_series(tmp_path)
    assert vol.shape == (3, 2, 2)
    assert [int(vol[i, 0, 0]) for i in range(3)] == [0, 1, 2]
    np.testing.assert_allclose(spacing, [5.0, 0.7, 0.8])


def test_compressed_syntax_rejected(tmp_path):
    px = np.zeros((2, 2), np.int16)
    f = tmp_path / "jpeg.dcm"
    write_dicom(f, px, syntax="1.2.840.10008.1.2.4.70")
    with pytest.raises(ValueError, match="transcode"):
        read_dicom_file(f)


def test_processor_load_image_dicom_dir(tmp_path):
    from mmmm_tpu.preprocess.processor import NNUNetProcessor

    iop = [1, 0, 0, 0, 1, 0]
    for i, z in enumerate([0.0, 2.5]):
        write_dicom(tmp_path / f"s{i}.dcm", np.full((4, 4), i, np.int16),
                    ipp=[0, 0, z], iop=iop, instance=i + 1)
    proc = NNUNetProcessor.__new__(NNUNetProcessor)  # loader only
    data, spacing = proc.load_image(tmp_path)
    assert data.shape == (2, 4, 4)
    np.testing.assert_allclose(spacing, [2.5, 0.7, 0.8])

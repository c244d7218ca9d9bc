"""NASA Earthdata HDF4 swath -> points (EarthdataHDFPointMapper parity).

The reference (``core/.../formatMapper/EarthdataHDFPointMapper.java:217-259``)
delegates file decode to the NetCDF-Java library and itself only walks the
2D geolocation grid emitting one point per cell, with data-field values
sampled asymmetrically (``offset`` + ``increment`` indexing, for data grids
at a higher resolution than the geolocation grid) joined into userData.

This module keeps that split:

* a pure-python/numpy HDF4 **DFSD-layout** codec (the classic scientific
  data set layout from the public HDF 4.x specification: DD blocks with
  DFTAG_NT/SDD/SDL/SD/NDG records, big-endian, uncompressed). Files
  written by the modern SD/Vgroup API or with compression are out of
  scope (that structure lives in Vgroup/Vdata records the reference reads
  through NetCDF-Java) — a ``ValueError`` says so explicitly.
* the mapper itself (:func:`earthdata_points`), VECTORIZED over the whole
  grid instead of the reference's per-cell loop, with identical emission
  semantics: one row per geolocation cell, lon/lat (or switched) and one
  column per data variable plus the reference's space-joined ``user_data``
  string.

Group paths like ``MOD_Swath_LST/Geolocation_Fields/Longitude`` are
carried in the DFSD dataset LABEL (DFTAG_SDL), mirroring the path strings
the reference builds from Vgroup nesting.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_MAGIC = b"\x0e\x03\x13\x01"
_TAG_NT = 106
_TAG_SDD = 701
_TAG_SDL = 704
_TAG_SD = 702
_TAG_NDG = 720

# DFNT number-type codes (HDF4 spec) -> big-endian numpy dtypes
_DFNT_TO_DTYPE = {
    5: ">f4",
    6: ">f8",
    20: ">i1",
    21: ">u1",
    22: ">i2",
    23: ">u2",
    24: ">i4",
    25: ">u4",
}
_DTYPE_TO_DFNT = {np.dtype(v.replace(">", "")): k for k, v in _DFNT_TO_DTYPE.items()}


def encode_hdf4_sds(datasets: dict[str, np.ndarray]) -> bytes:
    """{path_name: 2D array} -> HDF4 bytes (DFSD layout, uncompressed)."""
    payloads: list[tuple[int, int, bytes]] = []  # (tag, ref, payload)
    for ref, (name, arr) in enumerate(datasets.items(), start=1):
        arr = np.ascontiguousarray(arr)
        if arr.ndim != 2:
            raise ValueError(f"{name}: DFSD writer takes 2D arrays, got shape {arr.shape}")
        dfnt = _DTYPE_TO_DFNT.get(arr.dtype)
        if dfnt is None:
            arr = arr.astype(np.float64)
            dfnt = 6
        be = arr.astype(_DFNT_TO_DTYPE[dfnt])
        width = be.dtype.itemsize * 8
        payloads.append((_TAG_NT, ref, struct.pack(">BBBB", 1, dfnt, width, 1)))
        sdd = struct.pack(">h", 2) + struct.pack(">ii", *be.shape)
        sdd += struct.pack(">HH", _TAG_NT, ref)  # data NT
        sdd += struct.pack(">HH", _TAG_NT, ref) * 2  # per-dim scale NTs
        payloads.append((_TAG_SDD, ref, sdd))
        payloads.append((_TAG_SDL, ref, name.encode() + b"\x00"))
        payloads.append((_TAG_SD, ref, be.tobytes()))
        members = struct.pack(">HHHHHH", _TAG_SDD, ref, _TAG_SDL, ref, _TAG_SD, ref)
        payloads.append((_TAG_NDG, ref, members))
    ndd = len(payloads)
    header_len = 4 + 2 + 4 + 12 * ndd
    out = bytearray(_MAGIC)
    out += struct.pack(">hI", ndd, 0)
    off = header_len
    for tag, ref, payload in payloads:
        out += struct.pack(">HHII", tag, ref, off, len(payload))
        off += len(payload)
    for _, _, payload in payloads:
        out += payload
    return bytes(out)


def decode_hdf4_sds(blob: bytes) -> dict[str, np.ndarray]:
    """HDF4 bytes (DFSD layout) -> {path_name: 2D array}."""
    if blob[:4] != _MAGIC:
        raise ValueError("not an HDF4 file (bad magic)")
    dds: dict[tuple[int, int], bytes] = {}
    pos = 4
    while pos:
        ndd, nxt = struct.unpack_from(">hI", blob, pos)
        pos += 6
        for _ in range(ndd):
            tag, ref, off, ln = struct.unpack_from(">HHII", blob, pos)
            pos += 12
            if tag != 0:
                dds[(tag, ref)] = blob[off : off + ln]
        pos = nxt
    groups = [(ref, payload) for (tag, ref), payload in dds.items() if tag == _TAG_NDG]
    if not groups:
        raise ValueError(
            "no DFTAG_NDG scientific data groups found — SD/Vgroup-layout or "
            "compressed HDF4 files are out of scope for this DFSD codec"
        )
    out: dict[str, np.ndarray] = {}
    for ref, payload in sorted(groups):
        members = {}
        for i in range(0, len(payload), 4):
            t, r = struct.unpack_from(">HH", payload, i)
            members[t] = r
        sdd = dds[(_TAG_SDD, members[_TAG_SDD])]
        rank = struct.unpack_from(">h", sdd, 0)[0]
        dims = struct.unpack_from(f">{rank}i", sdd, 2)
        nt_tag, nt_ref = struct.unpack_from(">HH", sdd, 2 + 4 * rank)
        _, dfnt, _, _ = struct.unpack_from(">BBBB", dds[(nt_tag, nt_ref)], 0)
        dtype = _DFNT_TO_DTYPE.get(int(dfnt))
        if dtype is None:
            raise ValueError(f"unsupported DFNT number type {dfnt}")
        name = dds.get((_TAG_SDL, members.get(_TAG_SDL, -1)), b"").split(b"\x00")[0].decode() or f"sds_{ref}"
        data = np.frombuffer(dds[(_TAG_SD, members[_TAG_SD])], dtype=dtype).reshape(dims)
        out[name] = data.astype(data.dtype.newbyteorder("="))
    return out


def _asym(arr: np.ndarray, j: np.ndarray, i: np.ndarray, offset: int, increment: int) -> np.ndarray:
    """getDataAsym: data grids at higher resolution than the geolocation
    grid are sampled at (j*increment + offset, i*increment + offset)."""
    jj = np.clip(j * increment + offset, 0, arr.shape[0] - 1)
    ii = np.clip(i * increment + offset, 0, arr.shape[1] - 1)
    return arr[jj, ii]


def earthdata_points(
    arrays: dict[str, np.ndarray],
    data_variables: list[str],
    *,
    root_group: str = "MOD_Swath_LST",
    geolocation_field: str = "Geolocation_Fields",
    data_field: str = "Data_Fields",
    longitude_name: str = "Longitude",
    latitude_name: str = "Latitude",
    offset: int = 0,
    increment: int = 1,
    switch_xy: bool = False,
) -> pa.Table:
    """Decoded swath arrays -> point rows (vectorized mapper).

    One row per geolocation cell: ``lon``/``lat`` (the reference stores
    (lat, lon) unless ``switch_xy`` — we always emit named columns), one
    column per data variable, and the reference's space-joined
    ``user_data`` string."""
    geo = f"{root_group}/{geolocation_field}"
    dat = f"{root_group}/{data_field}"
    lon2d = np.asarray(arrays[f"{geo}/{longitude_name}"], dtype=np.float64)
    lat2d = np.asarray(arrays[f"{geo}/{latitude_name}"], dtype=np.float64)
    jj, ii = np.meshgrid(np.arange(lon2d.shape[0]), np.arange(lon2d.shape[1]), indexing="ij")
    j = jj.ravel()
    i = ii.ravel()
    lon = lon2d[j, i]
    lat = lat2d[j, i]
    if switch_xy:
        lon, lat = lat, lon
    cols: dict[str, pa.Array] = {"lon": pa.array(lon), "lat": pa.array(lat)}
    vals = []
    for var in data_variables:
        v = _asym(np.asarray(arrays[f"{dat}/{var}"]), j, i, offset, increment)
        vals.append(v)
        cols[var] = pa.array(v)
    if vals:
        user = [" ".join(str(v[k]) for v in vals) for k in range(len(j))]
        cols["user_data"] = pa.array(user, type=pa.string())
    return pa.table(cols)


def earthdata_points_fn(data_variables: list[str], blob_col: str = "bytes", **kwargs):
    """map_batches stage over ``read_binary_files`` output: each HDF4 blob
    row explodes into its point rows (flat-map semantics, like the
    reference's FlatMapFunction over file addresses)."""

    def stage(batch: pa.Table) -> pa.Table:
        tables = []
        for blob in batch[blob_col].to_pylist():
            arrays = decode_hdf4_sds(blob)
            tables.append(earthdata_points(arrays, data_variables, **kwargs))
        if not tables:
            return earthdata_points(
                {
                    f"{kwargs.get('root_group', 'MOD_Swath_LST')}/{kwargs.get('geolocation_field', 'Geolocation_Fields')}/Longitude": np.zeros((0, 1)),
                    f"{kwargs.get('root_group', 'MOD_Swath_LST')}/{kwargs.get('geolocation_field', 'Geolocation_Fields')}/Latitude": np.zeros((0, 1)),
                },
                [],
            )
        return pa.concat_tables(tables)

    return stage

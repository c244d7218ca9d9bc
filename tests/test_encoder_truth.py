"""External-truth pins for the cell encoders (VERDICT r03 #4): the golden
fixtures pin the implementation against itself, so these tests pin it
against INDEPENDENT sources instead:

* S2: published cell-id token vectors from the public s2sphere test suite
  (s2sphere/tests/test_cell_id.py, mirrored from s2geometry) — a 64-bit
  token match against an independent implementation cannot be
  coincidental — plus spec-derived level-0 face tokens and an independent
  per-bit recursive FromFaceIJ reimplementation (straight from the public
  S2 constants kPosToIJ / kPosToOrientation, no shared code with the
  library's table-driven encoder).
* Geohash: the canonical public test vectors (Wikipedia's
  ``u4pruydqqvj`` / ``ezs42`` examples).
* h3lite: intentionally NOT Uber-H3-bit-compatible (documented in
  encoders/h3lite.py — the reference has no H3 either), so published H3
  vectors do not apply; its invariants are covered by its own tests.
"""

import numpy as np

from incubator_sedona_ray.encoders import geohash, s2

# ---------------------------------------------------------------- S2 tokens

# (lat, lng, leaf token) — public s2sphere test-suite vectors
S2_PUBLISHED = [
    (49.703498679, 11.770681595, "47a1cbd595522b39"),
    (45.486546517, -93.449700022, "52b30b71698e729d"),
]


def test_s2_published_leaf_tokens():
    for lat, lng, tok in S2_PUBLISHED:
        cid = int(s2.leaf_cell_ids(np.array([lng]), np.array([lat]))[0])
        assert s2.token(cid) == tok


def test_s2_face_cell_tokens_from_spec():
    """Level-0 cell ids are (face << 61) | (1 << 60) by the public id
    layout; face = axis of largest |component| (0=+x 1=+y 2=+z 3=-x 4=-y
    5=-z), so the six face-center points pin tokens 1,3,5,7,9,b."""
    for lng, lat, tok in [
        (0, 0, "1"),
        (90, 0, "3"),
        (0, 90, "5"),
        (180, 0, "7"),
        (-90, 0, "9"),
        (0, -90, "b"),
    ]:
        cid = int(
            np.uint64(s2.cells_for_points(np.array([float(lng)]), np.array([float(lat)]), 0)[0])
        )
        assert s2.token(cid) == tok
        assert cid == (["1", "3", "5", "7", "9", "b"].index(tok) << 61) | (1 << 60)


def _from_face_ij_independent(face: int, i: int, j: int) -> int:
    """Independent per-bit recursive FromFaceIJ: one Hilbert step per
    level using the PUBLIC S2 constants (kPosToIJ rows + orientation
    xors), no lookup-table precomputation shared with encoders/s2.py."""
    swap, invert = 0x1, 0x2
    pos_to_ij = [
        [0, 1, 3, 2],  # orientation 0:   (0,0) (0,1) (1,1) (1,0)
        [0, 2, 3, 1],  # orientation swap
        [3, 2, 0, 1],  # orientation invert
        [3, 1, 0, 2],  # orientation swap|invert
    ]
    ij_to_pos = [[0] * 4 for _ in range(4)]
    for orient, row in enumerate(pos_to_ij):
        for pos, ij in enumerate(row):
            ij_to_pos[orient][ij] = pos
    pos_to_orientation = [swap, 0, 0, invert | swap]

    orientation = face & swap
    pos = 0
    for k in range(29, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = ij_to_pos[orientation][ij]
        pos = (pos << 2) | p
        orientation ^= pos_to_orientation[p]
    return (face << 61) | (pos << 1) | 1


def test_s2_from_face_ij_vs_independent_reimplementation():
    rng = np.random.default_rng(17)
    faces = rng.integers(0, 6, 64)
    iis = rng.integers(0, 1 << 30, 64)
    jjs = rng.integers(0, 1 << 30, 64)
    got = s2.from_face_ij(
        faces.astype(np.int64), iis.astype(np.int64), jjs.astype(np.int64)
    ).astype(np.uint64)
    for n in range(64):
        want = _from_face_ij_independent(int(faces[n]), int(iis[n]), int(jjs[n]))
        assert int(got[n]) == want, (n, int(faces[n]), int(iis[n]), int(jjs[n]))
    # corners too (degenerate orientations)
    for f in range(6):
        for i in (0, (1 << 30) - 1):
            for j in (0, (1 << 30) - 1):
                got1 = int(
                    s2.from_face_ij(
                        np.array([f], np.int64), np.array([i], np.int64), np.array([j], np.int64)
                    )[0]
                )
                assert got1 == _from_face_ij_independent(f, i, j)


def test_s2_parent_of_published_leaf():
    """parent() must agree with plain token truncation semantics on the
    published vectors: the level-k token is a prefix-rounded form of the
    leaf id (lsb replaced, trailing zeros stripped)."""
    lat, lng, tok = S2_PUBLISHED[0]
    leaf = int(s2.leaf_cell_ids(np.array([lng]), np.array([lat]))[0])
    for level in (0, 1, 5, 10, 20, 29):
        pid = int(s2.parent(np.array([leaf], np.uint64), level)[0])
        lsb = 1 << (2 * (30 - level))
        assert pid == (leaf & ~(lsb - 1)) | lsb  # spec: round to level lsb


# ---------------------------------------------------------------- geohash


def test_geohash_public_vectors():
    # Wikipedia's canonical examples
    assert geohash.encode(10.40744, 57.64911, 11) == "u4pruydqqvj"
    assert geohash.encode(-5.603, 42.605, 5) == "ezs42"
    assert geohash.encode_many(
        np.array([10.40744, -5.603]), np.array([57.64911, 42.605]), 5
    ).tolist() == ["u4pru", "ezs42"]
    # decode must land inside the advertised bbox
    x0, y0, x1, y1 = geohash.decode_bbox("u4pruydqqvj")
    assert x0 <= 10.40744 <= x1 and y0 <= 57.64911 <= y1

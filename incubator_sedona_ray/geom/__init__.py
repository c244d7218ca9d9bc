"""Pure-numpy geometry kernel (no GEOS).

Replaces the reference's JTS kernel (``common/src/main/java/.../Functions.java``,
``Predicates.java``, ``GeometrySerializer.java``) with:

* :mod:`.core`        — lightweight Geometry value type
* :mod:`.wkb`         — WKB encode/decode (incl. vectorized point fast paths)
* :mod:`.wkt`         — WKT parse/format
* :mod:`.predicates`  — DE-9IM-compatible predicates (vectorized where hot)
* :mod:`.ops`         — measures/constructions (area, centroid, convex hull, ...)
* :mod:`.strtree`     — STR-packed R-tree with vectorized batch envelope query
"""

from .core import Geometry, GeometryType  # noqa: F401

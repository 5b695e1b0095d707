"""Pure-Python/numpy geometry kernel: WKB/WKT codec + planar predicates.

The engine's geometry convention (SURVEY.md §1.2): geometry travels as WKB
in a ``BinaryType`` column, CRS in column metadata.  This module is the
computational core behind the ST_* pandas UDFs — the container has no
shapely/GEOS, and nothing here needs it: the reference exercises only
Point/Polygon/MultiPolygon with planar predicates (SURVEY.md §2 G), all
implementable with the standard published algorithms (shoelace area, ray
casting, segment intersection).

Geometry in memory is a tagged tuple:
    ("Point", (x, y))
    ("Polygon", [ring, ...])           ring = [(x, y), ...] closed
    ("MultiPolygon", [[ring, ...], ...])

Geometry subtype policy mirrors the reference: Polygon / MultiPolygon
(+Point for the cells-as-points raster model); anything else raises
ValueError exactly like convert_geom_to_gee (load_report.py:51-57).
"""

from __future__ import annotations

import math
import struct

_WKB_POINT = 1
_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6

_TYPE_BY_CODE = {_WKB_POINT: "Point", _WKB_POLYGON: "Polygon",
                 _WKB_MULTIPOLYGON: "MultiPolygon"}
_CODE_BY_TYPE = {v: k for k, v in _TYPE_BY_CODE.items()}


# ------------------------------------------------------------------ WKB --

def wkb_dumps(geom) -> bytes:
    """Little-endian ISO WKB."""
    kind, body = geom
    out = [b"\x01", struct.pack("<I", _CODE_BY_TYPE[kind])]
    if kind == "Point":
        out.append(struct.pack("<dd", *body))
    elif kind == "Polygon":
        out.append(_pack_rings(body))
    elif kind == "MultiPolygon":
        out.append(struct.pack("<I", len(body)))
        for rings in body:
            out.append(b"\x01")
            out.append(struct.pack("<I", _WKB_POLYGON))
            out.append(_pack_rings(rings))
    else:  # pragma: no cover - guarded by _CODE_BY_TYPE lookup
        raise ValueError(f"unsupported geometry type {kind!r}")
    return b"".join(out)


def _pack_rings(rings) -> bytes:
    out = [struct.pack("<I", len(rings))]
    for ring in rings:
        out.append(struct.pack("<I", len(ring)))
        for x, y in ring:
            out.append(struct.pack("<dd", x, y))
    return b"".join(out)


def wkb_loads(buf: bytes):
    geom, _ = _parse_geom(buf, 0)
    return geom


def _parse_geom(buf: bytes, off: int):
    little = buf[off] == 1
    fmt = "<" if little else ">"
    code = struct.unpack_from(fmt + "I", buf, off + 1)[0]
    off += 5
    # Full-code lookup, no flag masking: EWKB (SRID/Z/M flag bits set) and
    # corrupt input must fail loudly — masking with 0xFF silently accepted
    # EWKB and then read the SRID as a ring count, allocating gigabytes.
    kind = _TYPE_BY_CODE.get(code)
    if kind is None:
        if code & 0xE0000000 or code >= 1000:
            raise ValueError(
                f"unsupported WKB variant (code 0x{code:08x}); EWKB/Z/M "
                "geometries are not part of the engine's convention")
        raise ValueError(f"unsupported WKB geometry code {code}")
    if kind == "Point":
        x, y = struct.unpack_from(fmt + "dd", buf, off)
        return ("Point", (x, y)), off + 16
    if kind == "Polygon":
        rings, off = _parse_rings(buf, off, fmt)
        return ("Polygon", rings), off
    n = struct.unpack_from(fmt + "I", buf, off)[0]
    off += 4
    if n > (len(buf) - off) // 9:  # each member needs >= 9 bytes
        raise ValueError(f"corrupt WKB: {n} MultiPolygon members exceed buffer")
    polys = []
    for _ in range(n):
        (k2, rings), off = _parse_geom(buf, off)
        if k2 != "Polygon":
            raise ValueError("MultiPolygon member must be Polygon")
        polys.append(rings)
    return ("MultiPolygon", polys), off


def _parse_rings(buf: bytes, off: int, fmt: str):
    n_rings = struct.unpack_from(fmt + "I", buf, off)[0]
    off += 4
    if n_rings > (len(buf) - off) // 4:
        raise ValueError(f"corrupt WKB: {n_rings} rings exceed buffer")
    rings = []
    for _ in range(n_rings):
        n_pts = struct.unpack_from(fmt + "I", buf, off)[0]
        off += 4
        if 16 * n_pts > len(buf) - off:
            raise ValueError(f"corrupt WKB: {n_pts} points exceed buffer")
        coords = struct.unpack_from(fmt + "d" * (2 * n_pts), buf, off)
        off += 16 * n_pts
        rings.append(list(zip(coords[0::2], coords[1::2])))
    return rings, off


# ------------------------------------------------------------------ WKT --

def wkt_dumps(geom) -> str:
    kind, body = geom
    if kind == "Point":
        return f"POINT ({body[0]} {body[1]})"
    if kind == "Polygon":
        return f"POLYGON {_rings_wkt(body)}"
    if kind == "MultiPolygon":
        inner = ", ".join(_rings_wkt(rings) for rings in body)
        return f"MULTIPOLYGON ({inner})"
    raise ValueError(f"unsupported geometry type {kind!r}")


def _rings_wkt(rings) -> str:
    ring_strs = [
        "(" + ", ".join(f"{x} {y}" for x, y in ring) + ")" for ring in rings
    ]
    return "(" + ", ".join(ring_strs) + ")"


def wkt_loads(text: str):
    s = text.strip()
    upper = s.upper()
    if upper.startswith("MULTIPOLYGON"):
        body = s[s.index("(") :]
        polys = [_parse_ring_group(_strip_parens(g))
                 for g in _split_groups(_strip_parens(body))]
        return ("MultiPolygon", polys)
    if upper.startswith("POLYGON"):
        body = s[s.index("(") :]
        return ("Polygon", _parse_ring_group(_strip_parens(body)))
    if upper.startswith("POINT"):
        body = _strip_parens(s[s.index("(") :])
        x, y = body.split()
        return ("Point", (float(x), float(y)))
    raise ValueError(f"unsupported WKT: {text[:40]!r}")


def _strip_parens(s: str) -> str:
    s = s.strip()
    assert s[0] == "(" and s[-1] == ")", s[:30]
    return s[1:-1]


def _split_groups(s: str):
    """Split 'a),(b' style top-level comma-separated paren groups."""
    groups, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            groups.append(s[start:i].strip())
            start = i + 1
    groups.append(s[start:].strip())
    return [g for g in groups if g]


def _parse_ring_group(s: str):
    rings = []
    for ring_str in _split_groups(s):
        pts = []
        for pair in _strip_parens(ring_str).split(","):
            x, y = pair.split()
            pts.append((float(x), float(y)))
        rings.append(pts)
    return rings


# ----------------------------------------------------------- predicates --

def _iter_polys(geom):
    kind, body = geom
    if kind == "Polygon":
        yield body
    elif kind == "MultiPolygon":
        yield from body
    else:
        raise ValueError(f"expected polygonal geometry, got {kind}")


def _ring_area(ring) -> float:
    """Signed shoelace area, computed relative to the first vertex —
    translation invariance avoids the catastrophic cancellation of raw
    cross products for small rings far from the origin (UTM coordinates
    are ~1e7; hypothesis found 1e-6-relative errors without this)."""
    ox, oy = ring[0]
    a = 0.0
    n = len(ring)
    for i in range(n - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        a += (x1 - ox) * (y2 - oy) - (x2 - ox) * (y1 - oy)
    # tolerate unclosed rings
    if ring[0] != ring[-1]:
        x1, y1 = ring[-1]
        a += (x1 - ox) * (ring[0][1] - oy) - (ring[0][0] - ox) * (y1 - oy)
    return a / 2.0


def area(geom) -> float:
    """Planar area; interior rings (holes) subtract (PostGIS ST_Area)."""
    if geom[0] == "Point":
        return 0.0
    total = 0.0
    for rings in _iter_polys(geom):
        for i, ring in enumerate(rings):
            a = abs(_ring_area(ring))
            total += a if i == 0 else -a
    return total


def bounds(geom):
    kind, body = geom
    if kind == "Point":
        x, y = body
        return (x, y, x, y)
    xs, ys = [], []
    for rings in _iter_polys(geom):
        for x, y in rings[0]:
            xs.append(x)
            ys.append(y)
    return (min(xs), min(ys), max(xs), max(ys))


def centroid(geom):
    """Area-weighted centroid of polygonal geometry (shell rings minus
    holes); for Point returns the point.  Coordinates are translated to
    the first vertex before the cross products (same cancellation hygiene
    as _ring_area) and translated back at the end."""
    if geom[0] == "Point":
        return geom[1]
    ox, oy = next(_iter_polys(geom))[0][0]
    sa = sx = sy = 0.0
    for rings in _iter_polys(geom):
        for i, ring in enumerate(rings):
            r = [(x - ox, y - oy) for x, y in ring]
            if r[0] != r[-1]:
                r.append(r[0])
            a = cx = cy = 0.0
            for j in range(len(r) - 1):
                x1, y1 = r[j]
                x2, y2 = r[j + 1]
                cross = x1 * y2 - x2 * y1
                a += cross
                cx += (x1 + x2) * cross
                cy += (y1 + y2) * cross
            # normalize stored winding: shells contribute +|a|, holes
            # -|a|, with cx/cy flipped consistently — index-only sign
            # flipping ADDED standard CW-wound holes instead of
            # subtracting them
            want = 1.0 if i == 0 else -1.0
            flip = want if a >= 0 else -want
            sa += flip * a
            sx += flip * cx
            sy += flip * cy
    if sa == 0:  # degenerate: fall back to vertex mean of first shell
        ring = next(_iter_polys(geom))[0]
        return (sum(p[0] for p in ring) / len(ring),
                sum(p[1] for p in ring) / len(ring))
    return (sx / (3.0 * sa) + ox, sy / (3.0 * sa) + oy)


def point_in_polygon(x: float, y: float, geom) -> bool:
    """Even-odd ray casting; boundary points count as inside."""
    for rings in _iter_polys(geom):
        inside = False
        for i, ring in enumerate(rings):
            hit = _point_in_ring(x, y, ring)
            if hit == 2:  # on boundary of any ring -> inside the polygon
                return True
            if i == 0:
                if not hit:
                    break
                inside = True
            elif hit:
                inside = False  # inside a hole
                break
        if inside:
            return True
    return False


def _point_in_ring(x: float, y: float, ring) -> int:
    """0 outside, 1 inside, 2 on boundary."""
    r = list(ring)
    if r[0] != r[-1]:
        r.append(r[0])
    inside = False
    for i in range(len(r) - 1):
        x1, y1 = r[i]
        x2, y2 = r[i + 1]
        # boundary check: collinear + within segment bbox
        cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
        if (abs(cross) < 1e-12 * max(1.0, abs(x2 - x1) + abs(y2 - y1))
                and min(x1, x2) - 1e-12 <= x <= max(x1, x2) + 1e-12
                and min(y1, y2) - 1e-12 <= y <= max(y1, y2) + 1e-12):
            return 2
        if (y1 > y) != (y2 > y):
            xin = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if xin > x:
                inside = not inside
    return 1 if inside else 0


def _segments(rings):
    for ring in rings:
        r = list(ring)
        if r[0] != r[-1]:
            r.append(r[0])
        for i in range(len(r) - 1):
            yield r[i], r[i + 1]


def _seg_intersect(p1, p2, p3, p4) -> bool:
    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if abs(v) < 1e-12:
            return 0
        return 1 if v > 0 else -1

    def on_seg(a, b, c):
        return (min(a[0], b[0]) - 1e-12 <= c[0] <= max(a[0], b[0]) + 1e-12
                and min(a[1], b[1]) - 1e-12 <= c[1] <= max(a[1], b[1]) + 1e-12)

    o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
    o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and on_seg(p1, p2, p3):
        return True
    if o2 == 0 and on_seg(p1, p2, p4):
        return True
    if o3 == 0 and on_seg(p3, p4, p1):
        return True
    if o4 == 0 and on_seg(p3, p4, p2):
        return True
    return False


def intersects(ga, gb) -> bool:
    """Polygon/MultiPolygon/Point pairwise intersection test."""
    if ga[0] == "Point" and gb[0] == "Point":
        return ga[1] == gb[1]
    if ga[0] == "Point":
        return point_in_polygon(ga[1][0], ga[1][1], gb)
    if gb[0] == "Point":
        return point_in_polygon(gb[1][0], gb[1][1], ga)
    axmin, aymin, axmax, aymax = bounds(ga)
    bxmin, bymin, bxmax, bymax = bounds(gb)
    if axmax < bxmin or bxmax < axmin or aymax < bymin or bymax < aymin:
        return False
    # vertex containment either way
    for rings in _iter_polys(ga):
        x, y = rings[0][0]
        if point_in_polygon(x, y, gb):
            return True
    for rings in _iter_polys(gb):
        x, y = rings[0][0]
        if point_in_polygon(x, y, ga):
            return True
    # edge crossings
    segs_b = list(_segments([r for rings in _iter_polys(gb) for r in rings]))
    for sa in _segments([r for rings in _iter_polys(ga) for r in rings]):
        for sb in segs_b:
            if _seg_intersect(sa[0], sa[1], sb[0], sb[1]):
                return True
    return False


def _seg_cross_strict(p1, p2, p3, p4) -> bool:
    """True iff the OPEN segments properly cross (touching endpoints and
    collinear overlap do not count — boundary contact is allowed for
    containment)."""
    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if abs(v) < 1e-12:
            return 0
        return 1 if v > 0 else -1

    o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
    o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
    return o1 * o2 < 0 and o3 * o4 < 0


def contains(ga, gb) -> bool:
    """ga contains gb (boundary contact allowed).

    Point targets: boundary counts as contained.  Polygonal targets:
    (1) every shell vertex of gb inside ga, (2) no proper crossing between
    the boundaries, (3) no hole of ga strictly inside gb (a hole's region
    is outside ga).  Exact for simple polygons whose boundaries don't
    cross; holes-within-holes nesting beyond one level is out of scope of
    the engine's geometry convention.
    """
    if gb[0] == "Point":
        return point_in_polygon(gb[1][0], gb[1][1], ga)
    for rings in _iter_polys(gb):
        for x, y in rings[0]:
            if not point_in_polygon(x, y, ga):
                return False
    segs_a = list(_segments([r for rings in _iter_polys(ga) for r in rings]))
    for sb in _segments([rings[0] for rings in _iter_polys(gb)]):
        for sa in segs_a:
            if _seg_cross_strict(sb[0], sb[1], sa[0], sa[1]):
                return False
    # a hole of ga strictly inside gb leaves part of gb outside ga; probe
    # the hole's vertex mean (interior for convex holes — a hole VERTEX
    # lies on ga's boundary, which our pip counts as inside ga)
    for rings in _iter_polys(ga):
        for hole in rings[1:]:
            hx = sum(p[0] for p in hole) / len(hole)
            hy = sum(p[1] for p in hole) / len(hole)
            if point_in_polygon(hx, hy, gb) and not point_in_polygon(hx, hy, ga):
                return False
    return True


def union(geoms):
    """Geometric dissolve (ST_Union aggregate form, load_report.py:472).

    Disjoint inputs (the reference's and fixtures' case) dissolve to an
    exact MultiPolygon of all shells.  Overlapping interiors are NOT
    re-noded — the result keeps both shells; ``union_area`` computes the
    correct area for convex overlaps via pairwise inclusion-exclusion.
    A full polygon-clipping union (Vatti/Martinez) is out of scope for the
    fixtures' disjoint data; documented divergence.
    """
    polys = []
    for g in geoms:
        if g is None:
            continue
        for rings in _iter_polys(g):
            polys.append(rings)
    if not polys:
        return None
    if len(polys) == 1:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)


def geom_type(geom) -> str:
    return geom[0]


def exterior_coords(geom):
    """Exterior-ring coordinate lists (convert_geom_to_gee,
    load_report.py:52-55): Polygon -> [ring]; MultiPolygon -> rings."""
    if geom[0] == "Point":
        raise ValueError("Unsupported geometry type: Point")
    return [[list(pt) for pt in rings[0]] for rings in _iter_polys(geom)]


# convex clip for union_area's inclusion-exclusion
def _clip_convex(subject, clip_ring):
    """Sutherland-Hodgman: clip subject ring by convex clip ring (CCW)."""
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= -1e-12

    def line_int(a, b, p, q):
        a1 = b[1] - a[1]
        b1 = a[0] - b[0]
        c1 = a1 * a[0] + b1 * a[1]
        a2 = q[1] - p[1]
        b2 = p[0] - q[0]
        c2 = a2 * p[0] + b2 * p[1]
        det = a1 * b2 - a2 * b1
        if abs(det) < 1e-18:
            return p
        return ((b2 * c1 - b1 * c2) / det, (a1 * c2 - a2 * c1) / det)

    out = list(subject)
    cr = list(clip_ring)
    if cr[0] == cr[-1]:
        cr = cr[:-1]
    if _ring_area(cr + [cr[0]]) < 0:
        cr = cr[::-1]
    for i in range(len(cr)):
        a, b = cr[i], cr[(i + 1) % len(cr)]
        if not out:
            return []
        inp = out
        out = []
        for j in range(len(inp)):
            p, q = inp[j], inp[(j + 1) % len(inp)]
            pin, qin = inside(p, a, b), inside(q, a, b)
            if pin:
                out.append(p)
                if not qin:
                    out.append(line_int(p, q, a, b))
            elif qin:
                out.append(line_int(p, q, a, b))
    return out


def union_area(geoms) -> float:
    """Area of the union for convex shells: inclusion-exclusion to pairwise
    order (exact when no point lies in 3+ shells, true for the fixtures)."""
    shells = []
    for g in geoms:
        if g is None:
            continue
        for rings in _iter_polys(g):
            shells.append(rings[0])
    total = sum(abs(_ring_area(s)) for s in shells)
    for i in range(len(shells)):
        for j in range(i + 1, len(shells)):
            clipped = _clip_convex(shells[i], shells[j])
            if len(clipped) >= 3:
                total -= abs(_ring_area(clipped + [clipped[0]]))
    return total


def make_box(xmin, ymin, xmax, ymax):
    return ("Polygon", [[(xmin, ymin), (xmax, ymin), (xmax, ymax),
                         (xmin, ymax), (xmin, ymin)]])


def grid_cells(geom_bounds, cell: float):
    """Grid-cell ids (ix, iy) whose cell bbox intersects the given bounds —
    the bucketing primitive for the grid-partitioned spatial join (§4)."""
    xmin, ymin, xmax, ymax = geom_bounds
    ix0, ix1 = math.floor(xmin / cell), math.floor(xmax / cell)
    iy0, iy1 = math.floor(ymin / cell), math.floor(ymax / cell)
    return [(ix, iy) for ix in range(ix0, ix1 + 1) for iy in range(iy0, iy1 + 1)]

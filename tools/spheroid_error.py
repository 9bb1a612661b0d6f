#!/usr/bin/env python3
"""Measured error bounds of the geodesic length kernel vs the true
WGS84 ellipsoid (VERDICT r14 item 7).

The engine's `osm_way_length_geodesic` kernel (OsmKernels.geoSeg):

    x  = (lat1_c + lat2_c) * 8.726646259971648e-5      # mid-lat, radians
    dx = dlon_c * cosPoly(x)                           # 8th-order Maclaurin
    len_m = sqrt(dx^2 + dlat_c^2) * 1113.2             # m per centi-degree

i.e. equirectangular on a sphere of radius a = 6378137 m with a shared
polynomial cosine. This script measures its relative error against the
true ellipsoidal geodesic (Vincenty inverse, WGS84 a=6378137,
f=1/298.257223563 — the public formula) across latitude bands, bearings
and segment lengths, evaluating the kernel on EXACT centi-degree values
so the table isolates the MEASURE's error, not the fixture's integer
coordinate quantization (~1.1 m/endpoint, a property of the data model).

Output: the per-band table pasted into SCALE.md.
"""
import math

A = 6378137.0
F = 1 / 298.257223563
B = A * (1 - F)


def vincenty_inverse(phi1, lam1, phi2, lam2):
    """True WGS84 geodesic distance (m). Standard Vincenty inverse."""
    U1 = math.atan((1 - F) * math.tan(phi1))
    U2 = math.atan((1 - F) * math.tan(phi2))
    L = lam2 - lam1
    sinU1, cosU1 = math.sin(U1), math.cos(U1)
    sinU2, cosU2 = math.sin(U2), math.cos(U2)
    lam = L
    for _ in range(200):
        sinl, cosl = math.sin(lam), math.cos(lam)
        sin_sigma = math.sqrt((cosU2 * sinl) ** 2 +
                              (cosU1 * sinU2 - sinU1 * cosU2 * cosl) ** 2)
        if sin_sigma == 0:
            return 0.0
        cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cosl
        sigma = math.atan2(sin_sigma, cos_sigma)
        sin_alpha = cosU1 * cosU2 * sinl / sin_sigma
        cos2_alpha = 1 - sin_alpha ** 2
        cos_2sm = cos_sigma - 2 * sinU1 * sinU2 / cos2_alpha if cos2_alpha else 0.0
        C = F / 16 * cos2_alpha * (4 + F * (4 - 3 * cos2_alpha))
        lam_prev = lam
        lam = L + (1 - C) * F * sin_alpha * (
            sigma + C * sin_sigma * (cos_2sm + C * cos_sigma *
                                     (-1 + 2 * cos_2sm ** 2)))
        if abs(lam - lam_prev) < 1e-14:
            break
    u2 = cos2_alpha * (A ** 2 - B ** 2) / B ** 2
    k1 = (math.sqrt(1 + u2) - 1) / (math.sqrt(1 + u2) + 1)
    AA = (1 + 0.25 * k1 ** 2) / (1 - k1)
    BB = k1 * (1 - 3 / 8 * k1 ** 2)
    d_sigma = BB * sin_sigma * (cos_2sm + BB / 4 * (
        cos_sigma * (-1 + 2 * cos_2sm ** 2) -
        BB / 6 * cos_2sm * (-3 + 4 * sin_sigma ** 2) * (-3 + 4 * cos_2sm ** 2)))
    return B * AA * (sigma - d_sigma)


def cos_poly(x):
    """The engine's shared 8th-order Maclaurin cosine (OsmKernels.cosPoly)."""
    x2 = x * x
    return 1.0 + x2 * (-0.5 + x2 * (0.041666666666666664 + x2 *
                       (-0.001388888888888889 + x2 * 2.48015873015873e-5)))


def kernel_len(lat1_c, lon1_c, lat2_c, lon2_c):
    """The engine's geoSeg on exact (double) centi-degree coordinates —
    the r15 item-8 WGS84-corrected form: Δlon scaled by cos(mid-lat) ·
    N(φ)/a, Δlat by M(φ)/a, both radius ratios as the degree-2
    shared-literal polynomials in s² = 1 − cos²(mid-lat) that the Scala
    template renders verbatim (OsmKernels.geoSeg)."""
    x = (lat1_c + lat2_c) * 8.726646259971648e-5
    c = cos_poly(x)
    s2 = 1.0 - c * c
    nf = 1.0 + s2 * (0.0033471899950706582 + s2 * 1.680552129465167e-5)
    mf = 0.9933056200098587 + s2 * (0.009974347900033367 + s2 * 8.34650937458643e-5)
    # association matches geoSeg: dlon * (c*nf) — the factored form the
    # dwithin broadcast factor dimension reuses bit-for-bit
    dx = (lon2_c - lon1_c) * (c * nf)
    dy = (lat2_c - lat1_c) * mf
    return math.sqrt(dx * dx + dy * dy) * 1113.2


def kernel_len_sphere(lat1_c, lon1_c, lat2_c, lon2_c):
    """The pre-r16 spherical kernel, kept for the before/after table."""
    x = (lat1_c + lat2_c) * 8.726646259971648e-5
    dx = (lon2_c - lon1_c) * cos_poly(x)
    dy = lat2_c - lat1_c
    return math.sqrt(dx * dx + dy * dy) * 1113.2


def main():
    deg = math.pi / 180
    print(f"| band | Δ=0.01° N | Δ=0.01° E | Δ=0.01° NE "
          f"| Δ=1° N | Δ=1° E | Δ=1° NE | worst |")
    print("|---|---|---|---|---|---|---|---|")
    overall = 0.0
    for lat0 in range(0, 81, 10):
        cells = []
        worst = 0.0
        for dlat_deg, dlon_deg in [(0.01, 0.0), (0.0, 0.01), (0.01, 0.01),
                                   (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)]:
            lat1, lon1 = float(lat0), 10.0
            lat2, lon2 = lat1 + dlat_deg, lon1 + dlon_deg
            true_m = vincenty_inverse(lat1 * deg, lon1 * deg,
                                      lat2 * deg, lon2 * deg)
            est_m = kernel_len(lat1 * 100, lon1 * 100, lat2 * 100, lon2 * 100)
            rel = (est_m - true_m) / true_m
            cells.append(rel)
            worst = max(worst, abs(rel))
        overall = max(overall, worst)
        row = " | ".join(f"{c * 100:+.3f}%" for c in cells)
        print(f"| {lat0}°–{lat0}.01°/{lat0}°–{lat0 + 1}° | {row} "
              f"| {worst * 100:.3f}% |")
    print(f"\nmax |relative error| over all bands/shapes: {overall * 100:.3f}%")


if __name__ == "__main__":
    main()

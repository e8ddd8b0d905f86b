"""GeoKeyDirectory parsing (GeoTIFF 19-008r4).

Reimplements the observable behavior of GeoKeyDirectory::from_tag_data
(/root/reference/src/geo_key_directory.rs:62-461): the 4-short header, the
48 known key ids, SHORT-inline / DOUBLE-indexed / ASCII-sliced value
locations, strict validation (count == 4 + 4*n_keys, unknown key id → hard
error), and the default directory (version 1.1.1) when the tag is absent
(/root/reference/src/geo_key_directory.rs:548-605).

Values land in a flat dict keyed by the reference's snake_case field names,
so goldens from /root/reference/tests/integration.rs:120-143 port directly.
"""

from __future__ import annotations

# key id -> (field_name, kind) where kind in {short, double, ascii, raster_type}
# Ref ids: /root/reference/src/geo_key_directory.rs:612-665 (public OGC table).
GEO_KEY_FIELDS: dict[int, tuple[str, str]] = {
    1024: ("model_type", "short"),
    1025: ("raster_type", "raster_type"),
    1026: ("citation", "ascii"),
    2048: ("geographic_type", "short"),
    2049: ("geog_citation", "ascii"),
    2050: ("geog_geodetic_datum", "short"),
    2051: ("geog_prime_meridian", "short"),
    2052: ("geog_linear_units", "short"),
    2053: ("geog_linear_unit_size", "double"),
    2054: ("geog_angular_units", "short"),
    2055: ("geog_angular_unit_size", "double"),
    2056: ("geog_ellipsoid", "short"),
    2057: ("geog_semi_major_axis", "double"),
    2058: ("geog_semi_minor_axis", "double"),
    2059: ("geog_inv_flattening", "double"),
    2060: ("geog_azimuth_units", "short"),
    2061: ("geog_prime_meridian_long", "double"),
    3072: ("projected_type", "short"),
    3073: ("proj_citation", "ascii"),
    3074: ("projection", "short"),
    3075: ("proj_coord_trans", "short"),
    3076: ("proj_linear_units", "short"),
    3077: ("proj_linear_unit_size", "double"),
    3078: ("proj_std_parallel1", "double"),
    3079: ("proj_std_parallel2", "double"),
    3080: ("proj_nat_origin_long", "double"),
    3081: ("proj_nat_origin_lat", "double"),
    3082: ("proj_false_easting", "double"),
    3083: ("proj_false_northing", "double"),
    3084: ("proj_false_origin_long", "double"),
    3085: ("proj_false_origin_lat", "double"),
    3086: ("proj_false_origin_easting", "double"),
    3087: ("proj_false_origin_northing", "double"),
    3088: ("proj_center_long", "double"),
    3089: ("proj_center_lat", "double"),
    3090: ("proj_center_easting", "double"),
    3091: ("proj_center_northing", "double"),
    3092: ("proj_scale_at_nat_origin", "double"),
    3093: ("proj_scale_at_center", "double"),
    3094: ("proj_azimuth_angle", "double"),
    3095: ("proj_straight_vert_pole_long", "double"),
    4096: ("vertical", "short"),
    4097: ("vertical_citation", "ascii"),
    4098: ("vertical_datum", "short"),
    4099: ("vertical_units", "short"),
}

RASTER_TYPES = {0: "undefined", 1: "area", 2: "point", 32767: "user_defined"}


class GeoKeyError(ValueError):
    pass


def default_geo_key_directory() -> dict:
    """Directory defaults when GeoKeyDirectoryTag is absent: version 1.1.1."""
    return {
        "key_directory_version": 1,
        "key_revision": 1,
        "minor_revision": 1,
    }


def parse_geo_key_directory(
    directory: list[int],
    doubles: list[float],
    ascii_params: str,
) -> dict:
    """Parse the u16 directory + indexed params into a flat dict.

    Validation mirrors the reference: header must hold ≥4 shorts and the
    total length must equal 4 + 4*number_of_keys
    (/root/reference/src/geo_key_directory.rs:68-83); an unknown key id is a
    hard error (:89-93).
    """
    if len(directory) < 4:
        raise GeoKeyError("GeoKeyDirectory header requires at least 4 shorts")
    version, revision, minor, n_keys = directory[:4]
    if len(directory) != 4 + 4 * n_keys:
        raise GeoKeyError(
            f"GeoKeyDirectory length {len(directory)} != 4 + 4*{n_keys}"
        )
    out: dict = {
        "key_directory_version": version,
        "key_revision": revision,
        "minor_revision": minor,
    }
    for i in range(n_keys):
        key_id, location, count, value_offset = directory[4 + 4 * i : 8 + 4 * i]
        if key_id not in GEO_KEY_FIELDS:
            raise GeoKeyError(f"unknown geo key id {key_id}")
        name, kind = GEO_KEY_FIELDS[key_id]
        if kind in ("short", "raster_type"):
            if location != 0:
                raise GeoKeyError(f"key {key_id}: SHORT value must be inline")
            value = value_offset
            if kind == "raster_type":
                if value not in RASTER_TYPES:
                    raise GeoKeyError(f"unknown raster type {value}")
                value = RASTER_TYPES[value]
        elif kind == "double":
            if location != 34736:
                raise GeoKeyError(f"key {key_id}: expected GeoDoubleParams location")
            # reference requires exactly one value per DOUBLE key
            # (geo_key_directory.rs get_double: count != 1 is an error)
            if count != 1:
                raise GeoKeyError(
                    f"key {key_id}: unexpected count: expected 1, got {count}"
                )
            if value_offset >= len(doubles):
                raise GeoKeyError(f"key {key_id}: double index out of range")
            value = doubles[value_offset]
        elif kind == "ascii":
            if location != 34737:
                raise GeoKeyError(f"key {key_id}: expected GeoAsciiParams location")
            # trailing '|' terminator dropped: end = offset + count - 1;
            # reference requires start < len AND end < len
            # (geo_key_directory.rs get_string)
            end = value_offset + count - 1
            if value_offset >= len(ascii_params):
                raise GeoKeyError(f"key {key_id}: ascii start offset out of range")
            if end >= len(ascii_params) or value_offset > end:
                raise GeoKeyError(f"key {key_id}: ascii slice out of range")
            value = ascii_params[value_offset:end]
        else:  # pragma: no cover
            raise GeoKeyError(f"bad kind {kind}")
        out[name] = value
    return out

"""Round-13 property tests: IPv6 LPM vs a brute-force containment
model, and scalar_ip6 formatting vs Python's own ipaddress module."""

from __future__ import annotations

import hashlib
import ipaddress

import downloader_spark.operators.network as net


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def oct_(tag, key, mod):
    return h60(f"{tag}:{key}") % mod


def _hi(key: int) -> int:
    """Lookup-address hi (x6..w6 tags — distinct from prefix a6..d6)."""
    return (
        oct_("x6", key, net._G1_MOD) * net._P48
        + oct_("y6", key, net._G2_MOD) * net._P32
        + oct_("z6", key, net._G3_MOD) * net._P16
        + oct_("w6", key, net._G4_MOD)
    )


def _pfx_hi(key: int) -> int:
    """Prefix-generator hi (the a6..d6 tag family)."""
    return (
        oct_("a6", key, net._G1_MOD) * net._P48
        + oct_("b6", key, net._G2_MOD) * net._P32
        + oct_("c6", key, net._G3_MOD) * net._P16
        + oct_("d6", key, net._G4_MOD)
    )


def _lo(key: int) -> int:
    return h60(f"lo6:{key}") % (1 << 60)


def test_join_ip_prefix6_matches_bruteforce_model(spark):
    """The 4-level nibble-ladder v6 LPM vs a brute-force model that
    checks true 128-bit containment of every (ip, prefix) pair with
    Python ints — same md5 derivations, independent matcher."""
    n_nation, n_supp, n_cust, n_part, n_orders = 9, 40, 200, 400, 400
    tables = {
        "nation": spark.createDataFrame(
            [(k,) for k in range(n_nation)], "n_nationkey long"
        ),
        "supplier": spark.createDataFrame(
            [(k,) for k in range(1, n_supp + 1)], "s_suppkey long"
        ),
        "customer": spark.createDataFrame(
            [(k,) for k in range(1, n_cust + 1)], "c_custkey long"
        ),
        "part": spark.createDataFrame(
            [(k,) for k in range(1, n_part + 1)], "p_partkey long"
        ),
        "orders": spark.createDataFrame(
            [(k,) for k in range(1, n_orders + 1)], "o_orderkey long"
        ),
    }
    orig = net.load_table
    net.load_table = lambda s, d, name: tables[name]
    try:
        got = {
            r.o_orderkey: (r.ip_hi, r.ip_lo, r.matched_len, r.asn)
            for r in net.join_ip_prefix6(spark, "ignored").collect()
        }
    finally:
        net.load_table = orig

    prefixes = {}  # (start_hi, plen) -> min asn
    for k in range(n_nation):
        key = ((k % net._G1_MOD) * net._P48, 16)
        prefixes[key] = min(prefixes.get(key, 1 << 62), 60000 + k)
    for k in range(1, n_supp + 1):
        start = (
            oct_("a6", k, net._G1_MOD) * net._P48
            + oct_("b6", k, net._G2_MOD) * net._P32
        )
        key = (start, 32)
        prefixes[key] = min(prefixes.get(key, 1 << 62), 70000 + k)
    for k in range(1, n_cust + 1):
        start = (
            oct_("a6", k, net._G1_MOD) * net._P48
            + oct_("b6", k, net._G2_MOD) * net._P32
            + oct_("c6", k, net._G3_MOD) * net._P16
        )
        key = (start, 48)
        prefixes[key] = min(prefixes.get(key, 1 << 62), 400000 + k)
    for k in range(1, n_cust + 1):  # off-nibble /44 level, sparsified
        if k % 17:
            continue
        start = (
            oct_("a6", k, net._G1_MOD) * net._P48
            + oct_("b6", k, net._G2_MOD) * net._P32
            + oct_("e6", k, 2) * 1048576
        )
        key = (start, 44)
        prefixes[key] = min(prefixes.get(key, 1 << 62), 500000 + k)
    for k in range(1, n_part + 1):
        key = (_pfx_hi(k), 64)
        prefixes[key] = min(prefixes.get(key, 1 << 62), 900000 + k)

    want = {}
    for k in range(1, n_orders + 1):
        hi, lo = _hi(k), _lo(k)
        ip128 = (hi << 64) | lo  # true 128-bit containment check
        best = None
        for (start_hi, plen), asn in prefixes.items():
            start128 = start_hi << 64
            span = 1 << (128 - plen)
            if start128 <= ip128 < start128 + span:
                if best is None or plen > best[0]:
                    best = (plen, asn)
        if best is not None:
            want[k] = (hi, lo, best[0], best[1])
    assert got == want
    assert len(want) == n_orders  # nations cover all 8 /16 slots
    depths = {v[2] for v in want.values()}
    # every broad ladder level is hit, including the off-nibble /44
    assert {16, 32, 44, 48} <= depths


def test_scalar_ip6_colon_hex_matches_ipaddress_module(spark):
    """The engine's colon-hex formatting vs the stdlib's
    exploded IPv6Address rendering of the same 128-bit value."""
    n = 50
    tables = {
        "orders": spark.createDataFrame(
            [(k,) for k in range(1, n + 1)], "o_orderkey long"
        )
    }
    orig = net.load_table
    net.load_table = lambda s, d, name: tables[name]
    try:
        rows = {
            r.o_orderkey: r for r in net.scalar_ip6(spark, "ignored").collect()
        }
    finally:
        net.load_table = orig
    for k in range(1, n + 1):
        hi, lo = _hi(k), _lo(k)
        addr = ipaddress.IPv6Address((hi << 64) | lo)
        r = rows[k]
        assert r.colon_hex == addr.exploded
        assert r.ip_hi == hi and r.ip_lo == lo
        assert r.net64 == hi
        assert r.net16 == hi - hi % net._P48


# ------------------------------------------------------ unicode-fold dedup


def test_dedup_unicode_fold_catches_pairs_exact_hash_misses(spark):
    """The planted width/ligature/case variants must (a) hash as
    DISTINCT raw documents — i.e. byte-exact dedup is blind to them —
    and (b) collapse into one fold-group each, flagged
    exact_dedup_blind = 1; and the real normalizer must agree with
    Python's own unicodedata on every planted mapping."""
    import unicodedata

    from downloader_spark.plans.registry import registry

    rows = registry()["dedup_unicode_fold"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) > 0
    # every group of 4 consecutive doc_ids collapses to one row
    assert all(r.n_members == 4 for r in rows)
    assert all(r.first_doc % 4 == 0 for r in rows)
    # blind groups exist: raw variants differ, so md5-over-raw-bytes
    # (dedup_exact_hash's key) cannot merge them
    blind = [r for r in rows if r.exact_dedup_blind == 1]
    assert len(blind) > 0
    assert all(r.n_raw_variants > 1 for r in blind)
    # spot-check the planted alphabet against the stdlib directly
    for v, base in [
        ("ｅｘａｍｐｌｅ", "example"),
        ("ﬁnal", "final"),
        ("KELVIN", "kelvin"),
        ("Straße", "strasse"),  # ß casefolds to ss (lower() would not)
    ]:
        assert unicodedata.normalize("NFKC", v).casefold() == base

"""InetAddressPoint analogs (`misc/.../InetAddressPoint.java`,
`InetAddressRange.java`): encode round-trips, CIDR bound arithmetic,
and filter semantics on a hand-built address table."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.ip import (cidr_bounds, ip_cidr, ip_exact,
                                         ip_range, ipv4_to_long,
                                         long_to_ipv4, parse_ipv4)

ADDRS = ["0.0.0.0", "10.2.0.1", "10.2.255.255", "10.3.128.9",
         "10.4.0.0", "192.168.1.77", "255.255.255.255"]


def test_parse_and_bounds():
    assert parse_ipv4("10.2.0.1") == (10 << 24) | (2 << 16) | 1
    assert cidr_bounds("10.2.0.0/15") == (parse_ipv4("10.2.0.0"),
                                          parse_ipv4("10.3.255.255"))
    assert cidr_bounds("1.2.3.4/32") == (parse_ipv4("1.2.3.4"),) * 2
    assert cidr_bounds("0.0.0.0/0") == (0, 2 ** 32 - 1)
    # non-aligned base: suffix bits cleared (newPrefixQuery semantics)
    assert cidr_bounds("10.2.99.7/16") == (parse_ipv4("10.2.0.0"),
                                           parse_ipv4("10.2.255.255"))
    with pytest.raises(ValueError):
        parse_ipv4("1.2.3.999")
    with pytest.raises(ValueError):
        cidr_bounds("1.2.3.4/33")
    with pytest.raises(NotImplementedError):
        parse_ipv4("::1")


@pytest.fixture(scope="module")
def table(spark):
    df = spark.createDataFrame([(i, a) for i, a in enumerate(ADDRS)],
                               "doc_id long, ip string")
    return df.withColumn("ipl", ipv4_to_long(F.col("ip")))


def test_encode_roundtrip(table):
    got = table.select("ip", long_to_ipv4(F.col("ipl")).alias("back"),
                       "ipl").collect()
    for r in got:
        assert r["back"] == r["ip"]
        assert r["ipl"] == parse_ipv4(r["ip"])


def test_filters(table):
    assert [r["ip"] for r in ip_exact(table, "ipl", "10.3.128.9")
            .collect()] == ["10.3.128.9"]
    got = sorted(r["ip"] for r in
                 ip_range(table, "ipl", "10.2.0.0", "10.4.0.0").collect())
    assert got == ["10.2.0.1", "10.2.255.255", "10.3.128.9", "10.4.0.0"]
    got = sorted(r["ip"] for r in
                 ip_cidr(table, "ipl", "10.2.0.0/15").collect())
    assert got == ["10.2.0.1", "10.2.255.255", "10.3.128.9"]
    with pytest.raises(ValueError):
        ip_range(table, "ipl", "10.4.0.0", "10.2.0.0")


def test_encode_is_codegen(table):
    plan = (table.select("ipl")._jdf.queryExecution()
            .executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

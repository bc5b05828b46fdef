"""Deterministic synthetic Common-Crawl-style `pages` table generator.

Shape per BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Generated fully distributed — ``spark.range(n).mapInPandas(...)`` — so the
same generator scales from 1k test rows to bench millions without any driver
data. Everything derives from the row id via md5, no RNG state (mirrors the
reference's hermetic dummy-site generator,
/root/reference/tests/general/generate_dummy_site.py, in spirit).

Site model (FIXTURES.md §3): per host a binary link tree (page p → children
2p+1, 2p+2), 10% cross-host edges, duplicate edges (to exercise URL-seen),
tracking-param variants of the same target (to exercise canonicalization
collapsing), and robots-disallowed branches (/p3 subtree on every 3rd host;
last host fully disallowed).

The ``text`` column is the byte-identity oracle: it is computed at generation
time by the same pure ``scrape()`` that the Spark pipeline runs, so pytest can
assert pipeline-output == stored-text per url.
"""

from __future__ import annotations

import datetime as dt
import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from crawl4ai_spark.html.scraper import scrape

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])

_WORDS = (
    "spark crawl frontier engine parquet shuffle partition broadcast window "
    "markdown extract schema robots politeness bloom filter snapshot lineage "
    "throughput executor arrow pandas vector batch catalyst codegen prune "
    "quality content article heading paragraph tutorial guide data table"
).split()


def _h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def host_name(h: int) -> str:
    # distinct registrable domain per host so cross-host links classify as
    # external (is_external suffix-matches the base domain)
    return f"www.host{h}.com"


def page_url(h: int, p: int) -> str:
    return f"https://{host_name(h)}/p{p}"


def _para(h: int, p: int, k: int, n: int = 30) -> str:
    words = [_WORDS[_h(f"{h}/{p}/{k}/{i}") % len(_WORDS)] for i in range(n)]
    return " ".join(words)


def child_links(h: int, p: int, n_hosts: int, pages_per_host: int) -> list[str]:
    """The raw (messy, pre-normalization) hrefs embedded in page (h, p)."""
    links: list[str] = []
    for c in (2 * p + 1, 2 * p + 2):
        if c < pages_per_host:
            if c % 3 == 0:
                links.append(f"/p{c}?utm_source=feed&utm_campaign=x")  # tracking variant
            elif c % 3 == 1:
                links.append(f"p{c}")                              # relative
            else:
                links.append(page_url(h, c) + "/")                 # trailing slash
    # duplicate edge: also link to own sibling (same target discovered twice)
    if p > 0:
        sib = p - 1 if p % 2 == 0 else p + 1
        if sib < pages_per_host:
            links.append(f"/p{sib}#section")                       # fragment variant
    # 10% cross-host edge
    if p % 10 == 0 and n_hosts > 1:
        links.append(page_url((h + 1) % n_hosts, 0))
    return links


def build_html(h: int, p: int, n_hosts: int, pages_per_host: int) -> str:
    """One deterministic page; template rotates by p % 8 (FIXTURES.md §1)."""
    t = p % 8
    title = f"host{h} page{p} {_WORDS[_h(f't{h}/{p}') % len(_WORDS)]}"
    anchors = "".join(
        f'<a href="{href}">link to {href.split("?")[0].split("#")[0].split("/")[-1] or "home"}</a> '
        for href in child_links(h, p, n_hosts, pages_per_host)
    )
    head = (
        f"<head><title>{title}</title>"
        f'<meta name="description" content="{_para(h, p, 9, 8)}">'
        f'<meta property="og:title" content="{title}"></head>'
    )
    if t == 0:  # article
        body = (
            f"<article><h1>{title}</h1><p>{_para(h, p, 0)}</p><p>{_para(h, p, 1)}</p>"
            f'<div class="sidebar">{anchors}</div></article>'
        )
    elif t == 1:  # link farm
        body = f"<nav>{anchors}</nav><p>{_para(h, p, 0, 12)}</p>"
    elif t == 2:  # media
        body = (
            f'<h1>{title}</h1><img src="img{p}.jpg" alt="image {p}" width="640">'
            f'<img src="icon.png" width="16"><p>{_para(h, p, 0)}</p><div>{anchors}</div>'
        )
    elif t == 3:  # table
        rows = "".join(
            f"<tr><td>r{i}</td><td>{_h(f'{h}/{p}/cell{i}') % 1000}</td></tr>" for i in range(4)
        )
        body = (
            f"<h1>{title}</h1><table><caption>data {p}</caption>"
            f"<tr><th>key</th><th>value</th></tr>{rows}</table>"
            f"<p>{_para(h, p, 0)}</p><div>{anchors}</div>"
        )
    elif t == 4:  # product list
        prods = "".join(
            f'<div class="product"><h2 class="title">item {p}-{i}</h2>'
            f'<span class="price">${(_h(f"{h}/{p}/pr{i}") % 9000) / 100 + 10:.2f}</span>'
            f'<a href="/p{p}/item{i}">view</a></div>'
            for i in range(3)
        )
        body = f"<h1>{title}</h1>{prods}<p>{_para(h, p, 0)}</p><div>{anchors}</div>"
    elif t == 5:  # head-metadata heavy
        body = f"<main><h1>{title}</h1><p>{_para(h, p, 0)}</p><div>{anchors}</div></main>"
    elif t == 6:  # code page
        body = (
            f"<h1>{title}</h1><pre><code>def f_{p}():\n    return {p}</code></pre>"
            f"<p>{_para(h, p, 0)}</p><div>{anchors}</div>"
        )
    else:  # edge: shallow page, malformed-ish
        body = f"<div><p>{_para(h, p, 0, 10)}<div>{anchors}"
    return f"<html>{head}<body>{body}</body></html>"


def gen_page(h: int, p: int, n_hosts: int, pages_per_host: int) -> dict:
    url = page_url(h, p)
    html = build_html(h, p, n_hosts, pages_per_host)
    text = scrape(url, html)["text"]
    lang = "de" if p % 13 == 5 else ("fr" if p % 29 == 7 else "en")
    ts = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
        seconds=_h(url) % (86400 * 300)
    )
    return {
        "url": url,
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }


def generate_pages(
    spark: SparkSession, n_hosts: int = 10, pages_per_host: int = 31,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed generation: one row per (host, page) id."""
    total = n_hosts * pages_per_host
    rng = spark.range(total, numPartitions=partitions or min(32, max(2, total // 256)))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                gen_page(int(i) // pages_per_host, int(i) % pages_per_host,
                         n_hosts, pages_per_host)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    return rng.mapInPandas(gen, PAGES_SCHEMA)


def generate_seeds(spark: SparkSession, n_hosts: int = 10) -> DataFrame:
    """Seed list: root page of each host, priority 0 (FIXTURES.md §2)."""
    return spark.createDataFrame(
        [(page_url(h, 0), 0.0) for h in range(n_hosts)], ["url", "priority"]
    )


def robots_rules(h: int, n_hosts: int) -> str:
    if h == n_hosts - 1 and n_hosts > 1:
        return "User-agent: *\nDisallow: /\n"
    if h % 3 == 0:
        return "User-agent: *\nDisallow: /p3\n"
    return "User-agent: *\nDisallow:\n"


def generate_robots(spark: SparkSession, n_hosts: int = 10,
                    fetch_time: int = 1735689600) -> DataFrame:
    """robots table (host, rules, fetch_time, hash) — FIXTURES.md §4.
    One host (h≡1 mod 7, h>0) gets NO row at all → fail-open path."""
    rows = []
    for h in range(n_hosts):
        if h % 7 == 1 and h > 0:
            continue  # missing robots → fail-open (ref utils.py:348-355)
        rules = robots_rules(h, n_hosts)
        rows.append((host_name(h), rules, fetch_time,
                     hashlib.md5(rules.encode()).hexdigest()))
    return spark.createDataFrame(rows, ["host", "rules", "fetch_time", "hash"])


# ---------------------------------------------------------------------------
# Host-bucketed storage layout (the 100 TB scan-pruning design)
# ---------------------------------------------------------------------------
# At 10^10 pages the per-generation fetch join must not scan the whole pages
# table. Writing pages partitioned by a host hash-bucket column lets Spark's
# DYNAMIC PARTITION PRUNING cut the scan to the buckets containing this
# generation's scheduled hosts: the engine joins on (url, hb) and the
# broadcast batch's hb values prune partitions at runtime (audited in
# tests/test_engine_spark.py). An Iceberg `bucket(N, host)` hidden partition
# is the 1:1 production analog.

PAGES_HASH_BUCKETS = 64


def host_bucket_col(host_col):
    from pyspark.sql import functions as _F

    return _F.pmod(_F.xxhash64(host_col), _F.lit(PAGES_HASH_BUCKETS)).cast("int")


def with_host_bucket(pages: DataFrame) -> DataFrame:
    """Add the hb partition column (host derived from url)."""
    from pyspark.sql import functions as _F

    host = _F.coalesce(_F.try_parse_url("url", _F.lit("HOST")), _F.lit(""))
    return pages.withColumn("hb", host_bucket_col(host))


def write_pages_partitioned(pages: DataFrame, path: str) -> None:
    """Persist the pages table hash-partitioned by host bucket."""
    with_host_bucket(pages).write.mode("overwrite").partitionBy("hb").parquet(path)


# ---------------------------------------------------------------------------
# SSL certificate surface (S-extension, r5): the reference's
# `fetch_ssl_certificate` config attaches an SSLCertificate to each
# CrawlResult (ref ssl_certificate.py:62-134 builds the field dict from the
# live TLS handshake; models.py:149 `CrawlResult.ssl_certificate`). Fetch is
# simulated in this repo, so the handshake degrades to a deterministic
# per-host `certs` table with the SAME field set; the engine broadcast-joins
# it onto results (engine.attach_ssl).
# ---------------------------------------------------------------------------

_CAS = [
    ("Let's Encrypt", "R11", "sha256WithRSAEncryption"),
    ("DigiCert Inc", "DigiCert TLS RSA SHA256 2020 CA1",
     "sha256WithRSAEncryption"),
    ("Google Trust Services", "WR2", "ecdsa-with-SHA256"),
    ("Sectigo Limited", "Sectigo RSA DV", "sha384WithRSAEncryption"),
]


def generate_certs(spark: SparkSession, n_hosts: int = 10,
                   not_before: int = 1735689600) -> DataFrame:
    """certs table — one row per host with the reference SSLCertificate
    field set (subject/issuer CN+O, x509 version, serial hex, ASN.1
    GeneralizedTime validity window, sha256 fingerprint of a deterministic
    pseudo-DER blob, signature algorithm, SAN, base64 raw). Host
    h ≡ 3 (mod 5) gets NO row — the reference's `from_url` returns None on
    handshake failure, so those results keep ssl = null."""
    import base64
    import datetime as _dt

    rows = []
    for h in range(n_hosts):
        if h % 5 == 3 and h > 0:
            continue  # failed handshake → no certificate (ref from_url None)
        host = host_name(h)
        ca_o, ca_cn, sigalg = _CAS[h % len(_CAS)]
        der = hashlib.sha256(f"der:{host}".encode()).digest() * 4
        nb = _dt.datetime.fromtimestamp(not_before + h * 86400,
                                        _dt.timezone.utc)
        na = nb + _dt.timedelta(days=90)
        rows.append((
            host,
            host,                             # subject CN
            f"host{h} org",                   # subject O
            ca_cn, ca_o,
            2,                                # x509 v3 (0-indexed version 2)
            hashlib.md5(f"serial:{host}".encode()).hexdigest(),
            nb.strftime("%Y%m%d%H%M%SZ"),
            na.strftime("%Y%m%d%H%M%SZ"),
            hashlib.sha256(der).hexdigest(),
            sigalg,
            f"DNS:{host},DNS:host{h}.com",
            base64.b64encode(der).decode(),
        ))
    return spark.createDataFrame(rows, [
        "host", "subject_cn", "subject_o", "issuer_cn", "issuer_o",
        "version", "serial_number", "not_before", "not_after",
        "fingerprint", "signature_algorithm", "san", "raw_cert",
    ])

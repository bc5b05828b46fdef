"""Per-host politeness + robots.txt gate (F12, F15, F16).

Parity targets:
- RateLimiter (/root/reference/crawl4ai/async_dispatcher.py:28-85): per-host
  base delay U(1,3)s, exponential backoff ×2×jitter(0.75–1.25) on 429/503
  capped at 60s, decay ×0.75 on success, 3 retries. The reference keeps this
  as an in-process dict; here it is a ``host_state`` snapshot table updated
  per generation with ``applyInPandas`` per host group.
- robots gate (utils.py:313-365 + async_webcrawler.py:318-331): stdlib
  ``urllib.robotparser`` over cached rules, fail-open when no rules row;
  blocked rows get status_code=403 + 'Access denied by robots.txt'.

Scale design (the north rule's skew clause): the per-host quota is a
two-stage ranked window — stage 1 ranks within SALTED buckets
``(host, xxhash64(url) % n_salts)`` so one hot host cannot serialize a
partition, stage 2 re-ranks the ≤ quota·n_salts survivors per host. Both
windows shuffle only candidate keys, never page bodies.

Jitter is seeded-deterministic (md5 of host+generation) so two runs of the
same crawl schedule identical batches — the reproducibility rule.
"""

from __future__ import annotations

import hashlib
import urllib.robotparser
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

HOST_STATE_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("current_delay", T.DoubleType()),
    T.StructField("fail_count", T.IntegerType()),
    T.StructField("last_request_ts", T.DoubleType()),
    T.StructField("next_allowed_ts", T.DoubleType()),
])

MAX_DELAY = 60.0   # ref async_dispatcher.py:36
MAX_RETRIES = 3    # ref :37


def det_uniform(key: str, lo: float, hi: float) -> float:
    """Deterministic stand-in for random.uniform(lo, hi), keyed by md5."""
    h = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")
    return lo + (hi - lo) * (h / 2**64)


def base_delay(host: str, generation: int = 0) -> float:
    """U(1,3) seconds, deterministic per (host, generation) — ref :31."""
    return det_uniform(f"{host}#{generation}", 1.0, 3.0)


# ---------------------------------------------------------------------------
# scheduling window: per-host quota with salting (F12 + F8)
# ---------------------------------------------------------------------------

def schedule_batch(candidates: DataFrame, *, per_host_quota: int = 10,
                   global_limit: int | None = None, n_salts: int = 8,
                   host_quota: DataFrame | None = None,
                   priority=None) -> DataFrame:
    """Pick ≤ quota URLs per host (highest score first, stable ties), then
    optionally cap the global batch by the same priority order.

    Two-stage top-k: salted local rank (kills host skew) → exact host rank.
    Ordering key = (score DESC, depth ASC, url ASC) — the best-first priority
    tuple of the reference (bff_strategy.py:19,130-215: (-score, depth, url)).
    ``priority`` (a Column; lower first) prepends a dispatcher fairness rank
    — F13's starvation/retry aging — without changing the tuple's tie order.
    """
    order = [F.col("score").desc(), F.col("depth").asc(), F.col("url").asc()]
    if priority is not None:
        order = [priority.asc()] + order

    salted = candidates.withColumn(
        "__salt", F.pmod(F.xxhash64("url"), F.lit(n_salts))
    )
    w1 = Window.partitionBy("host", "__salt").orderBy(*order)
    stage1 = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= per_host_quota)   # ≤ quota per salt bucket
        .drop("__salt", "__r1")
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    ranked = stage1.withColumn("__rk", F.row_number().over(w2))
    if host_quota is not None:
        # backoff-aware quota (F12): hosts with recent 429/503 get a reduced
        # budget this generation; broadcast — the quota table is tiny
        ranked = (
            ranked.join(F.broadcast(host_quota.select("host", "quota")),
                        on="host", how="left")
            .filter(F.col("__rk") <= F.coalesce(F.col("quota"),
                                                F.lit(per_host_quota)))
            .drop("quota")
        )
    else:
        ranked = ranked.filter(F.col("__rk") <= per_host_quota)
    ranked = ranked.drop("__rk")

    if global_limit is not None:
        # distributed TakeOrdered — never a single-partition rank window
        # over the whole frontier (that plan collapses at 10^10 URLs)
        ranked = ranked.orderBy(*order).limit(global_limit)
    return ranked


# ---------------------------------------------------------------------------
# robots gate (F15)
# ---------------------------------------------------------------------------

def robots_allowed_col(df: DataFrame, robots: DataFrame, *,
                       user_agent: str = "*", url_col: str = "url",
                       host_col: str = "host") -> DataFrame:
    """Broadcast-join robots rules on host; evaluate stdlib robotparser in an
    Arrow batch (parser built once per distinct host within the batch).
    No rules row → allowed (fail-open, ref utils.py:348-355). Adds a boolean
    ``robots_allowed`` column."""
    joined = df.join(
        F.broadcast(robots.select(F.col("host").alias(host_col), "rules")),
        on=host_col, how="left",
    )
    cols = df.columns + ["robots_allowed"]
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("robots_allowed", T.BooleanType())]
    )

    def gate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            parsers: dict[str, urllib.robotparser.RobotFileParser | None] = {}
            allowed = []
            for u, h, rules in zip(pdf[url_col], pdf[host_col], pdf["rules"]):
                if rules is None or (isinstance(rules, float) and pd.isna(rules)):
                    allowed.append(True)  # fail-open
                    continue
                rp = parsers.get(h)
                if rp is None:
                    rp = urllib.robotparser.RobotFileParser()
                    rp.parse(str(rules).splitlines())
                    parsers[h] = rp
                try:
                    allowed.append(bool(rp.can_fetch(user_agent, u)))
                except Exception:
                    allowed.append(True)  # fail-open on parse weirdness
            pdf = pdf.copy()
            pdf["robots_allowed"] = allowed
            yield pdf[cols]

    return joined.mapInPandas(gate, out_schema)


# ---------------------------------------------------------------------------
# robots gate, native fast path (r4): compile once, gate with expressions
# ---------------------------------------------------------------------------
# robots_allowed_col spins a Python stage EVERY generation — measured ~20-25%
# of the small-shape e2e wall. The rules side is fully resolvable at compile
# time for a fixed user agent (stdlib robotparser: entry selection, rule
# order, quoted rule paths — can_fetch() above is ordered-prefix matching
# after that), so compile the robots DIM once per run into per-host ordered
# (prefix, allow) arrays via robotparser itself, then gate each generation
# with pure column expressions: filename = quote(path-and-after), first
# matching prefix decides, no rules → allow. The per-URL quote() transform
# is reproduced natively for ASCII ``%``-free URLs (the exact-parity
# domain); rows outside it route through the pUDF gate, which then
# processes ~zero rows.

RULES_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("__robots_rules", T.ArrayType(T.StructType([
        T.StructField("prefix", T.StringType()),
        T.StructField("allow", T.BooleanType()),
    ]))),
])

def compile_robots_rules(robots: DataFrame, *, user_agent: str = "*",
                         host_col: str = "host") -> DataFrame:
    """One Arrow pass over the robots dim (one row per host — runs ONCE per
    crawl, not per generation): resolve each host's robots.txt through
    stdlib robotparser for ``user_agent`` into the ordered (prefix, allow)
    list can_fetch() would scan. disallow_all → [('*', False)]; allow_all /
    no applicable entry → empty list (default allow)."""

    def compile_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        agent_token = user_agent.split("/")[0].lower()
        for pdf in batches:
            rows = []
            for host, rules in zip(pdf[host_col], pdf["rules"]):
                if rules is None or (isinstance(rules, float) and pd.isna(rules)):
                    continue  # no rules row → gate fail-opens via left join
                rp = urllib.robotparser.RobotFileParser()
                try:
                    rp.parse(str(rules).splitlines())
                except Exception:
                    rows.append((host, []))  # fail-open, like the pUDF gate
                    continue
                if rp.disallow_all:
                    rows.append((host, [("*", False)]))
                    continue
                if rp.allow_all:
                    rows.append((host, []))
                    continue
                entry = next((e for e in rp.entries
                              if e.applies_to(agent_token)), rp.default_entry)
                if entry is None:
                    rows.append((host, []))
                    continue
                rows.append((host, [(ln.path, bool(ln.allowance))
                                    for ln in entry.rulelines]))
            yield pd.DataFrame(rows, columns=["host", "__robots_rules"])

    return robots.select(F.col(host_col).alias("host"), "rules") \
                 .mapInPandas(compile_batch, RULES_SCHEMA)


def crawl_delay_table(robots: DataFrame, *,
                      user_agent: str = "crawl4ai-spark",
                      window_s: int = 20, default_quota: int = 10,
                      host_col: str = "host") -> DataFrame:
    """REP ``Crawl-delay`` directive → per-generation host quota. One
    Arrow pass over the robots dim (runs ONCE per crawl, like
    compile_robots_rules): stdlib robotparser resolves each host's delay
    for ``user_agent`` with exact UA-group semantics (a specific
    ``User-agent: <token>`` group overrides ``*``; malformed values are
    ignored), then the delay becomes a scheduling budget —
    ``quota = clamp(window_s div delay, 1, default_quota)`` — so a
    host asking for 10 s between requests gets at most window_s/10
    fetches per generation window. Hosts without the directive emit
    delay NULL / the default quota (the scheduler's left-join keeps them
    unconstrained). Returns (host, crawl_delay, quota)."""

    def one(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        agent_token = user_agent.split("/")[0].lower()
        for pdf in batches:
            rows = []
            for host, rules in zip(pdf[host_col], pdf["rules"]):
                if rules is None or (isinstance(rules, float)
                                     and pd.isna(rules)):
                    continue
                rp = urllib.robotparser.RobotFileParser()
                try:
                    rp.parse(str(rules).splitlines())
                    delay = rp.crawl_delay(agent_token)
                except Exception:
                    delay = None
                if delay is None:
                    rows.append((host, None, default_quota))
                else:
                    delay = int(delay)
                    quota = max(1, min(default_quota,
                                       window_s // max(delay, 1)))
                    rows.append((host, delay, quota))
            yield pd.DataFrame(
                rows, columns=["host", "crawl_delay", "quota"])

    return robots.select(F.col(host_col).alias("host"), "rules") \
                 .mapInPandas(one,
                              "host string, crawl_delay long, quota long")


def compile_rfc9309_rules(robots: DataFrame, *,
                          user_agent: str = "crawl4ai-spark",
                          host_col: str = "host") -> DataFrame:
    """Parse robots.txt bodies into RFC 9309 rule rows (host, pattern,
    allow) for ``rfc9309_decision`` (ops/scheduling.py): groups are
    consecutive User-agent lines followed by their rules; the applicable
    group is a specific matching UA group when one exists, else ``*``;
    comments and empty Disallow lines drop. Patterns keep their '*'/'$'
    wildcards — the whole point of the dialect; one Arrow pass over the
    per-host robots dim, like compile_robots_rules."""

    def parse_groups(text: str):
        groups = []
        agents: list[str] = []
        rules: list[tuple[str, bool]] = []
        seen_rule = False
        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            k, _, v = line.partition(":")
            k, v = k.strip().lower(), v.strip()
            if k == "user-agent":
                if seen_rule:
                    groups.append((agents, rules))
                    agents, rules, seen_rule = [], [], False
                agents.append(v.lower())
            elif k in ("allow", "disallow"):
                if v:
                    rules.append((v, k == "allow"))
                seen_rule = True
        if agents or rules:
            groups.append((agents, rules))
        return groups

    def one(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        token = user_agent.split("/")[0].lower()
        for pdf in batches:
            rows = []
            for host, body in zip(pdf[host_col], pdf["rules"]):
                if body is None or (isinstance(body, float)
                                    and pd.isna(body)):
                    continue
                groups = parse_groups(str(body))
                chosen = None
                for agents, rules in groups:
                    if any(a != "*" and a in token for a in agents):
                        chosen = rules
                        break
                if chosen is None:
                    for agents, rules in groups:
                        if "*" in agents:
                            chosen = rules
                            break
                for pattern, allow in chosen or []:
                    rows.append((host, pattern, allow))
            yield pd.DataFrame(rows, columns=["host", "pattern", "allow"])

    return robots.select(F.col(host_col).alias("host"), "rules") \
                 .mapInPandas(one, "host string, pattern string,"
                                   " allow boolean")


# printable-ASCII chars urllib.parse.quote(safe='/') percent-encodes,
# except '%' itself (%-bearing URLs are outside the native parity domain
# and route to the robotparser fill). Replacements only introduce
# '%'+hex-digits — none of which are in this set — so the literal
# replace chain below is order-independent.
_QUOTE_MAP = [(c, "%%%02X" % ord(c))
              for c in map(chr, range(0x20, 0x7F))
              if not (c.isalnum() or c in "_.~/-" or c == "%")]


def _native_filename(url_col: str):
    """can_fetch()'s per-URL normalization as expressions, for URLs in the
    exact-parity domain (printable ASCII, no '%'): filename = quote(path +
    [;params][?query][#fragment]) or '/'. quote() over ASCII = percent-
    encode every char outside the always-safe set — done as a chain of 30
    literal single-char replaces (whole-stage-codegen'd string passes; the
    earlier per-char split+transform+rlike form measured 1.7x SLOWER than
    the robotparser pUDF at 1M rows — arrays of one-char strings are not
    the fast path)."""
    after_host = F.regexp_extract(F.col(url_col),
                                  r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*(.*)$", 1)
    quoted = after_host
    for ch, pct in _QUOTE_MAP:
        quoted = F.replace(quoted, F.lit(ch), F.lit(pct))
    return F.when(quoted == "", F.lit("/")).otherwise(quoted)


def robots_allowed_col_native(df: DataFrame, compiled_rules: DataFrame, *,
                              url_col: str = "url", host_col: str = "host"
                              ) -> DataFrame:
    """Expression-only robots gate over pre-compiled rules. URLs outside the
    native quote() parity domain get robots_allowed = NULL here — callers
    route those rows through the pUDF gate (robots_allowed_col)."""
    joined = df.join(
        F.broadcast(compiled_rules.withColumnRenamed("host", host_col)),
        on=host_col, how="left")
    safe = F.col(url_col).rlike(r"^[\x20-\x7e]*$") \
        & ~F.col(url_col).contains("%") \
        & F.col(url_col).rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://")
    # the scheme check keeps scheme-less/relative URLs OUT of the parity
    # domain (the authority regexp would yield filename '/', diverging
    # from robotparser's quote(path)) — they abstain to the pUDF fill.
    filename = _native_filename(url_col)
    # rules arrays preserve file order → the first surviving element is the
    # first RuleLine whose path applies (prefix or '*'), can_fetch exactly.
    # F.get (0-based) returns NULL past the end — element_at throws under
    # ANSI when no rule matches.
    first = F.get(
        F.filter(F.col("__robots_rules"),
                 lambda r: (r["prefix"] == F.lit("*"))
                 | filename.startswith(r["prefix"])), 0)
    allowed = F.when(F.col("__robots_rules").isNull(), F.lit(True)) \
               .otherwise(F.coalesce(first["allow"], F.lit(True)))
    return joined.withColumn(
        "robots_allowed",
        F.when(safe, allowed).otherwise(F.lit(None).cast("boolean"))
    ).drop("__robots_rules")


def robots_allowed_col_fast(df: DataFrame, robots: DataFrame,
                            compiled_rules: DataFrame, *,
                            user_agent: str = "*", url_col: str = "url",
                            host_col: str = "host") -> DataFrame:
    """Full-fidelity gate in ONE linear pipeline: native expressions decide
    the parity domain; a pass-through Arrow stage fills only the rows the
    native path abstained on (NULL). No filter-split/union — that shape
    recomputes the upstream lineage once per branch and still schedules the
    fallback stage, which A/B-measured SLOWER than the plain pUDF gate at
    the 2k-URL e2e shape. Here abstained rows carry their robots text in a
    nullable side column and the fill stage short-circuits per batch when
    (as is typical for ASCII %-free frontiers) there is nothing to fill."""
    native = robots_allowed_col_native(df, compiled_rules,
                                       url_col=url_col, host_col=host_col)
    joined = native.join(
        F.broadcast(robots.select(F.col("host").alias(host_col),
                                  F.col("rules").alias("__rb_rules"))),
        on=host_col, how="left",
    ).withColumn("__rb_rules", F.when(F.col("robots_allowed").isNull(),
                                      F.col("__rb_rules")))

    cols = df.columns + ["robots_allowed"]
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("robots_allowed", T.BooleanType())])

    def fill(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mask = pdf["robots_allowed"].isna()
            if mask.any():
                parsers: dict[str, urllib.robotparser.RobotFileParser] = {}
                fills = []
                sub = pdf.loc[mask]
                for u, h, rules in zip(sub[url_col], sub[host_col],
                                       sub["__rb_rules"]):
                    if rules is None or (isinstance(rules, float)
                                         and pd.isna(rules)):
                        fills.append(True)  # fail-open
                        continue
                    rp = parsers.get(h)
                    if rp is None:
                        rp = urllib.robotparser.RobotFileParser()
                        rp.parse(str(rules).splitlines())
                        parsers[h] = rp
                    try:
                        fills.append(bool(rp.can_fetch(user_agent, u)))
                    except Exception:
                        fills.append(True)  # fail-open on parse weirdness
                pdf = pdf.copy()
                pdf.loc[mask, "robots_allowed"] = fills
            yield pdf[cols]

    return joined.mapInPandas(fill, out_schema)


# ---------------------------------------------------------------------------
# host state update (F12 backoff/decay, F16 retries)
# ---------------------------------------------------------------------------

def update_host_state(prev_state: DataFrame | None, batch_results: DataFrame,
                      generation: int) -> DataFrame:
    """Fold one generation's per-host outcomes into host_state.

    batch_results needs (host, status_code). Backoff semantics per ref
    async_dispatcher.py:65-85: 429/503 → delay = min(delay·2·jitter, 60),
    fail_count+1; success → delay = max(base, delay·0.75)."""
    agg = batch_results.groupBy("host").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("status_code").isin(429, 503), 1).otherwise(0)).alias("n_limited"),
    )
    if prev_state is not None:
        merged = agg.join(prev_state, on="host", how="full")
    else:
        merged = (
            agg.withColumn("current_delay", F.lit(None).cast("double"))
            .withColumn("fail_count", F.lit(None).cast("int"))
            .withColumn("last_request_ts", F.lit(None).cast("double"))
            .withColumn("next_allowed_ts", F.lit(None).cast("double"))
        )

    gen = generation

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for r in pdf.itertuples(index=False):
            host = r.host
            delay = r.current_delay if pd.notna(r.current_delay) else base_delay(host, gen)
            fails = int(r.fail_count) if pd.notna(r.fail_count) else 0
            last = r.last_request_ts if pd.notna(r.last_request_ts) else 0.0
            n = int(r.n) if pd.notna(r.n) else 0
            n_limited = int(r.n_limited) if pd.notna(r.n_limited) else 0
            if n > 0:
                if n_limited > 0:
                    jitter = det_uniform(f"{host}#bk#{gen}", 0.75, 1.25)
                    delay = min(delay * 2.0 * jitter, MAX_DELAY)
                    fails += n_limited
                else:
                    delay = max(base_delay(host, gen), delay * 0.75)
                last = float(gen)
            out.append((host, float(delay), fails, last, last + delay))
        return pd.DataFrame(out, columns=[f.name for f in HOST_STATE_SCHEMA.fields])

    # only hosts under backoff need state: scheduling's quota-shrink keys on
    # fail_count > 0 and clean hosts sit at base delay by construction, so
    # the table stays proportional to the RATE-LIMITED host set (and a run
    # with no 429/503 anywhere keeps it empty — the engine then skips the
    # fold job entirely)
    return merged.groupBy("host").applyInPandas(
        lambda pdf: fold(pdf), HOST_STATE_SCHEMA
    ).filter(F.col("fail_count") > 0)

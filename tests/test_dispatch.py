"""F13/F14 dispatcher analogs (operators/dispatch.py): the reference
MemoryAdaptiveDispatcher / SemaphoreDispatcher state machines re-expressed
as generation-batch admission control, driven by injectable memory readings
and clocks so every transition is deterministic."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.dispatch import (
    MemoryAdaptiveController,
    SemaphoreController,
    make_controller,
    priority_score,
    proc_meminfo_percent,
)


def _scripted(readings):
    it = iter(readings)
    return lambda: next(it)


def test_normal_operation_full_batch():
    c = MemoryAdaptiveController(1000, memory_reader=_scripted([50, 60, 70]))
    assert [c.admit(), c.admit(), c.admit()] == [1000, 1000, 1000]
    assert not c.memory_pressure_mode


def test_pressure_halves_then_recovery_doubles():
    # 91% → pressure (halve), 92% → halve again, 80% → recovery (double),
    # 70% → double back to full
    c = MemoryAdaptiveController(1024, min_batch=64,
                                 memory_reader=_scripted([91, 92, 80, 70, 60]))
    assert c.admit() == 512
    assert c.memory_pressure_mode
    assert c.admit() == 256
    assert c.admit() == 512      # recovery threshold crossed → doubling
    assert not c.memory_pressure_mode
    assert c.admit() == 1024
    assert c.admit() == 1024     # capped at the configured batch


def test_min_batch_clamped_to_batch_size():
    # min_batch above the configured batch must not GROW the batch under
    # pressure — the floor clamps to the ceiling
    c = MemoryAdaptiveController(10, min_batch=64,
                                 memory_reader=_scripted([91, 92]),
                                 memory_wait_timeout=None)
    assert c.admit() == 10   # max(min(64,10), 10//2) = 10
    assert c.admit() == 10


def test_pressure_floor_is_min_batch():
    c = MemoryAdaptiveController(256, min_batch=64,
                                 memory_reader=_scripted([91] * 5),
                                 memory_wait_timeout=None)
    assert [c.admit() for _ in range(5)] == [128, 64, 64, 64, 64]


def test_critical_defers_generation():
    # ≥95% admits 0 (defer); dropping to 90 (still pressure) halves;
    # between recovery and memory thresholds (87) stays in pressure mode
    c = MemoryAdaptiveController(1024, min_batch=64,
                                 memory_reader=_scripted([96, 90, 87]),
                                 memory_wait_timeout=None)
    assert c.admit() == 0
    assert c.memory_pressure_mode
    assert c.admit() == 512
    assert c.admit() == 256      # 87 > recovery(85): pressure persists


def test_memory_wait_timeout_raises():
    # pressure held past the timeout → MemoryError, like
    # async_dispatcher.py:190-198
    t = iter([0.0, 100.0, 700.0])
    c = MemoryAdaptiveController(100, memory_reader=_scripted([91, 92, 93]),
                                 memory_wait_timeout=600.0,
                                 clock=lambda: next(t))
    c.admit()
    c.admit()
    with pytest.raises(MemoryError):
        c.admit()


def test_oscillation_resets_wait_timer():
    # usage oscillating across the memory threshold (91, 87, 91, 87, ...)
    # must NOT accumulate wall-clock toward memory_wait_timeout: the
    # reference's _memory_monitor_task sets the timer to None whenever
    # usage < memory_threshold, even inside the 85-90 hysteresis band
    # where pressure mode (halved batch) persists (ADVICE r03 #1).
    t = iter([0.0, 200.0, 400.0, 800.0, 1300.0, 1900.0])
    c = MemoryAdaptiveController(1024, min_batch=64,
                                 memory_reader=_scripted([91, 87, 91, 87, 91, 87]),
                                 memory_wait_timeout=600.0,
                                 clock=lambda: next(t))
    sizes = [c.admit() for _ in range(6)]  # no MemoryError despite 1900 s span
    assert sizes == [512, 256, 128, 64, 64, 64]
    assert c.memory_pressure_mode  # hysteresis band: still halved


def test_sustained_rerise_still_times_out():
    # after a dip resets the timer, a new SUSTAINED episode above the
    # threshold must still trip the timeout from its own start time
    t = iter([0.0, 100.0, 200.0, 900.0])
    c = MemoryAdaptiveController(1024, min_batch=64,
                                 memory_reader=_scripted([91, 87, 91, 92]),
                                 memory_wait_timeout=600.0,
                                 clock=lambda: next(t))
    c.admit(); c.admit(); c.admit()  # dip at t=100 resets; re-rise at t=200
    with pytest.raises(MemoryError):
        c.admit()  # t=900: 700 s into the SECOND episode


def test_threshold_validation():
    with pytest.raises(ValueError):
        MemoryAdaptiveController(10, memory_threshold_percent=80,
                                 recovery_threshold_percent=85)


def test_semaphore_fixed_batch():
    c = SemaphoreController(5)
    assert [c.admit() for _ in range(3)] == [5, 5, 5]


def test_make_controller_dispatch():
    assert isinstance(make_controller("memory_adaptive", 10), MemoryAdaptiveController)
    s = make_controller("semaphore", 10, {"semaphore_count": 3})
    assert isinstance(s, SemaphoreController) and s.admit() == 3
    with pytest.raises(ValueError):
        make_controller("nope", 10)


def test_proc_meminfo_percent_sane():
    pct = proc_meminfo_percent()
    assert 0.0 <= pct <= 100.0


def test_priority_score_matches_reference_formula(spark):
    """Column form of _get_priority_score (async_dispatcher.py:217-226):
    lower sorts first; starved rows get -wait (longest wait = highest
    priority), others get retry_count."""
    df = spark.createDataFrame(
        [(0.0, 0), (2.0, 1), (5.0, 0), (9.0, 3)],
        "wait double, retries int")
    got = df.select(priority_score(F.col("wait"), F.col("retries"),
                                   fairness_timeout_gens=3).alias("p")) \
            .rdd.map(lambda r: r.p).collect()
    # reference: wait>timeout → -wait else retry_count
    assert got == [0.0, 1.0, -5.0, -9.0]


# --------------------------------------------------------------- engine e2e

@pytest.fixture(scope="module")
def crawl_inputs(spark):
    from crawl4ai_spark.sources.pagesgen import (
        generate_pages, generate_robots, generate_seeds)
    return (generate_pages(spark, 4, 12),
            generate_seeds(spark, 4),
            generate_robots(spark, 4))


def _run(spark, crawl_inputs, tmp_path, cfg):
    from crawl4ai_spark.engine import SparkWebEngine
    pages, seeds, robots = crawl_inputs
    eng = SparkWebEngine(spark, str(tmp_path))
    out = eng.run(pages, seeds, robots=robots, config=cfg)
    return eng, out


def test_engine_memory_adaptive_same_results(spark, crawl_inputs, tmp_path_factory):
    """A pressure episode mid-crawl shrinks generations but the crawl still
    drains to the SAME result url set as an unconstrained run."""
    from crawl4ai_spark.engine import CrawlConfig

    base = CrawlConfig(max_depth=3, max_pages=500, check_robots_txt=True)
    _, plain = _run(spark, crawl_inputs,
                    tmp_path_factory.mktemp("disp_plain"), base)

    readings = iter([50, 96, 91, 80] + [50] * 50)  # normal→critical→pressure→recover
    cfg = CrawlConfig(max_depth=3, max_pages=500, check_robots_txt=True,
                      batch_size=8,
                      dispatcher="memory_adaptive",
                      dispatcher_opts={"memory_reader": lambda: next(readings),
                                       "min_batch": 2,
                                       "check_interval": 0.0})
    eng, adaptive = _run(spark, crawl_inputs,
                         tmp_path_factory.mktemp("disp_adap"), cfg)

    a = {r.url for r in plain.select("url").collect()}
    b = {r.url for r in adaptive.select("url").collect()}
    assert a == b
    sizes = [r.n_scheduled for r in
             eng.store.read(spark, "metrics")
             .select("generation", "n_scheduled").distinct()
             .orderBy("generation").collect()]
    assert sizes and max(sizes) <= 8   # controller cap honored
    assert min(sizes) <= 4             # the pressed generation ran shrunk


def test_engine_semaphore_caps_generations(spark, crawl_inputs, tmp_path_factory):
    from crawl4ai_spark.engine import CrawlConfig

    cfg = CrawlConfig(max_depth=3, max_pages=500, check_robots_txt=True,
                      dispatcher="semaphore",
                      dispatcher_opts={"semaphore_count": 7})
    eng, out = _run(spark, crawl_inputs,
                    tmp_path_factory.mktemp("disp_sem"), cfg)
    sizes = [r.n_scheduled for r in
             eng.store.read(spark, "metrics")
             .select("generation", "n_scheduled").distinct().collect()]
    assert sizes and max(sizes) <= 7
    assert out.count() > 0

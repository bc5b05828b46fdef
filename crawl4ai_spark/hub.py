"""Crawler hub — named, discoverable crawler packs (reference hub.py:12-68).

The reference's ``CrawlerHub`` dynamically loads site-specific crawler
classes from ``crawl4ai/crawlers/<name>/crawler.py``, validates their
interface at subclass time, and attaches the module's ``__meta__`` dict.
Same mechanics here, Spark-shaped: a pack's ``run`` takes
``(spark, pages, store_root, **kwargs)`` and returns the results DataFrame
— a preset bundle of CrawlConfig + extraction schema + seed policy over a
pre-fetched pages table. The reference's shipped packs (google_search,
amazon_product) are browser+LLM-bound and stay out of scope; the shipped
``product_catalog`` pack demonstrates the registry with a fully in-sandbox
deterministic preset.
"""

from __future__ import annotations

import importlib
import inspect
import logging
from abc import ABC, abstractmethod
from pathlib import Path

logger = logging.getLogger(__name__)


class BaseCrawler(ABC):
    """Interface for a named crawler pack (ref hub.py:12-35)."""

    def __init__(self):
        self.logger = logging.getLogger(self.__class__.__name__)

    @abstractmethod
    def run(self, spark, pages, store_root: str, **kwargs):
        """Run the pack's preset crawl over a pages table; return the
        results DataFrame."""

    def __init_subclass__(cls, **kwargs):
        # subclass-time interface validation, like the reference's
        # signature + async checks (hub.py:24-35)
        super().__init_subclass__(**kwargs)
        run = cls.run
        params = list(inspect.signature(run).parameters)
        if params[:3] != ["self", "spark", "pages"]:
            raise TypeError(
                f"{cls.__name__} must implement "
                "'run(self, spark, pages, store_root, **kwargs)'")
        if inspect.iscoroutinefunction(run):
            raise TypeError(
                f"{cls.__name__}.run must be synchronous (Spark jobs block)")


class CrawlerHub:
    """Name → crawler-pack registry with directory discovery
    (ref hub.py:37-68)."""

    _crawlers: dict[str, type[BaseCrawler]] = {}

    @classmethod
    def _discover_crawlers(cls) -> None:
        base_path = Path(__file__).parent / "crawlers"
        if not base_path.is_dir():
            return
        for crawler_dir in sorted(base_path.iterdir()):
            if crawler_dir.is_dir() and (crawler_dir / "crawler.py").exists():
                try:
                    module = importlib.import_module(
                        f"crawl4ai_spark.crawlers.{crawler_dir.name}.crawler")
                    for attr in dir(module):
                        cls._maybe_register_crawler(
                            getattr(module, attr), crawler_dir.name)
                except Exception as e:
                    logger.warning("Failed %s: %s", crawler_dir.name, e)

    @classmethod
    def _maybe_register_crawler(cls, obj, name: str) -> None:
        if (isinstance(obj, type) and issubclass(obj, BaseCrawler)
                and obj is not BaseCrawler):
            module = importlib.import_module(obj.__module__)
            obj.meta = getattr(module, "__meta__", {})
            cls._crawlers[name] = obj

    @classmethod
    def get(cls, name: str) -> type[BaseCrawler] | None:
        if not cls._crawlers:
            cls._discover_crawlers()
        return cls._crawlers.get(name)

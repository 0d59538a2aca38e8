"""Catalog namespace + pagination (ref SharedTableManagerSuite intent)."""

from __future__ import annotations

import pytest

from delta_sharing_spark.catalog import CatalogError, ShareCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    cat = ShareCatalog(spark)
    for i in range(7):
        cat.add_table("share1", "default", f"t{i}", str(tmp_path / f"t{i}"))
    cat.add_table("share1", "other", "x", str(tmp_path / "x"))
    cat.add_table("share2", "default", "y", str(tmp_path / "y"))
    return cat


class TestListing:
    def test_shares(self, catalog):
        shares, token = catalog.list_shares()
        assert [s.name for s in shares] == ["share1", "share2"]
        assert token is None

    def test_pagination(self, catalog):
        page1, tok = catalog.list_tables("share1", "default", max_results=3)
        assert len(page1) == 3 and tok is not None
        page2, tok2 = catalog.list_tables("share1", "default", max_results=3,
                                          page_token=tok)
        assert len(page2) == 3 and tok2 is not None
        page3, tok3 = catalog.list_tables("share1", "default", max_results=3,
                                          page_token=tok2)
        assert len(page3) == 1 and tok3 is None
        names = [t.name for t in page1 + page2 + page3]
        assert names == [f"t{i}" for i in range(7)]

    def test_list_all_tables(self, catalog):
        tabs, _ = catalog.list_all_tables("share1")
        assert len(tabs) == 8

    def test_case_insensitive(self, catalog):
        assert catalog.get_share("SHARE1").name == "share1"
        assert catalog.get_table("Share1", "DEFAULT", "T3").name == "t3"

    def test_errors(self, catalog):
        with pytest.raises(CatalogError):
            catalog.get_share("nope")
        with pytest.raises(CatalogError):
            catalog.list_tables("share1", "nope")
        with pytest.raises(CatalogError):
            catalog.list_shares(page_token="!!!")
        with pytest.raises(CatalogError):
            catalog.add_table("s", "sch.bad", "t", "/tmp/x")
        with pytest.raises(CatalogError):
            catalog.add_table("s", "sch", "bad name", "/tmp/x")


class TestShareViews:
    def test_register_share_views(self, spark, events, tmp_path):
        from delta_sharing_spark.catalog import register_share_views
        from delta_sharing_spark.plans.log import TableLog

        d = str(tmp_path / "ev")
        TableLog(spark, d).create(events.limit(50), name="events")
        cat = ShareCatalog(spark)
        cat.add_table("s1", "default", "events", d)
        views = register_share_views(cat, "s1")
        assert views == ["s1_default_events"]
        assert spark.sql("SELECT count(*) FROM s1_default_events") \
            .collect()[0][0] == 50

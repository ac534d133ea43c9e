"""The reference's concrete ingest contract (sources/contracts.py):
every DDL column of public.posts (33) / public.comments (17) maps
through schema → fetch → normalize, and the default stdlib fetchers
reproduce the reference's requests exactly."""

from __future__ import annotations

import json

import pytest

from tia_data_pipeline_spark.pipelines import comments_pipeline, posts_pipeline
from tia_data_pipeline_spark.sources import contracts

# init_db_tables.sh:5-39 / :41-59, in DDL order.
POSTS_DDL_COLUMNS = [
    "id", "date_gmt", "modified_gmt", "title", "slug", "status", "type",
    "link", "content", "vsitems", "live_items", "excerpt", "author",
    "editor", "comment_status", "comments_count", "comments",
    "featured_image", "post_images", "seo", "categories", "tags",
    "companies", "is_sponsored", "sponsor", "is_partnership",
    "external_scripts", "show_ads", "is_subscriber_exclusive",
    "is_paywalled", "is_inappbrowser", "read_time", "word_count",
]
COMMENTS_DDL_COLUMNS = [
    "id", "post", "post_title", "post_link", "post_featured_image",
    "post_comments_count", "content", "excerpt", "status", "type",
    "parent", "author", "date_gmt", "can_edit", "editable_until",
    "children", "word_count",
]


def _fake_post(i: int) -> dict:
    """A record shaped like the public API's posts envelope entry:
    nested objects/arrays where the DDL has JSON columns, bare-ISO
    timestamps where it has TIMESTAMP."""
    return {
        "id": i,
        "date_gmt": f"2022-01-01T0{i % 10}:00:00",
        "modified_gmt": f"2022-01-02T0{i % 10}:30:00",
        "title": f"Post {i}",
        "slug": f"post-{i}",
        "status": "publish",
        "type": "post",
        "link": f"https://example.com/post-{i}",
        "content": f"body of post {i}",
        "vsitems": None,
        "live_items": None,
        "excerpt": f"excerpt {i}",
        "author": {"display_name": f"author-{i}"},
        "editor": "ed",
        "comment_status": "open",
        "comments_count": i % 3,
        "comments": [],
        "featured_image": {"source": f"https://img/{i}.jpg"},
        "post_images": [],
        "seo": {"title": f"Post {i}"},
        "categories": [{"name": "tech"}],
        "tags": [{"name": "asia"}],
        "companies": [],
        "is_sponsored": False,
        "sponsor": None,
        "is_partnership": False,
        "external_scripts": None,
        "show_ads": True,
        "is_subscriber_exclusive": False,
        "is_paywalled": bool(i % 2),
        "is_inappbrowser": False,
        "read_time": 3,
    }


def _fake_comment(cid: int, post_id: int) -> dict:
    return {
        "id": cid,
        "post": post_id,
        "post_title": f"Post {post_id}",
        "post_link": f"https://example.com/post-{post_id}",
        "post_featured_image": {"source": "https://img/x.jpg"},
        "post_comments_count": 1,
        "content": f"comment {cid} on {post_id}",
        "excerpt": f"comment {cid}",
        "status": "approved",
        "type": "comment",
        "parent": None,
        "author": {"display_name": "reader"},
        "date_gmt": "2022-01-01T10:00:00",
        "can_edit": False,
        "editable_until": "2022-01-01T10:30:00",
        "children": [],
    }


def test_posts_schema_covers_all_ddl_columns():
    # word_count is derived in normalize (posts_pipeline.py:41), so the
    # fetch schema holds the other 32; together they are the 33-col DDL.
    assert [f.name for f in contracts.POSTS_SCHEMA.fields] + ["word_count"] == POSTS_DDL_COLUMNS
    assert len(POSTS_DDL_COLUMNS) == 33


def test_comments_schema_covers_all_ddl_columns():
    assert (
        [f.name for f in contracts.COMMENTS_SCHEMA.fields] + ["word_count"]
        == COMMENTS_DDL_COLUMNS
    )
    assert len(COMMENTS_DDL_COLUMNS) == 17


def test_posts_pipeline_default_schema_end_to_end(spark):
    # materialized driver-side: the closure then captures plain data,
    # which cloudpickle ships by value (executors can't import tests)
    records = [_fake_post(i) for i in range(1, 4)]

    def fetch(page: int):
        return records if page == 1 else []

    existing = spark.createDataFrame([], contracts.POSTS_SCHEMA).selectExpr(
        "*", "cast(0 as bigint) AS word_count"
    )
    out = posts_pipeline(spark, fetch, contracts.POSTS_SCHEMA, existing)
    rows = {r["id"]: r for r in out.collect()}
    assert list(out.columns) == POSTS_DDL_COLUMNS
    assert len(rows) == 3
    # ts-norm applied to both DDL TIMESTAMP columns
    assert rows[1]["date_gmt"] == "2022-01-01 01:00:00"
    assert rows[1]["modified_gmt"] == "2022-01-02 01:30:00"
    # JSON columns hold serialized JSON (what the Postgres JSON column stores)
    assert json.loads(rows[1]["author"]) == {"display_name": "author-1"}
    assert json.loads(rows[1]["categories"]) == [{"name": "tech"}]
    # word_count derived from content, reference rule: len(content.split())
    assert rows[2]["word_count"] == len("body of post 2".split())


def test_comments_pipeline_default_schema_end_to_end(spark):
    posts = spark.createDataFrame(
        [(1, "2022-01-01 01:00:00"), (2, "2022-01-03 01:00:00")], "id int, date_gmt string"
    )

    by_post = {1: [_fake_comment(101, 1)]}

    def fetch(post_id):
        return by_post.get(int(post_id), [])

    existing = spark.createDataFrame([], contracts.COMMENTS_SCHEMA).selectExpr(
        "*", "cast(0 as bigint) AS word_count"
    )
    to_insert, manifest = comments_pipeline(
        spark,
        posts,
        fetch,
        contracts.COMMENTS_SCHEMA,
        existing,
        window_start="2022-01-01",
        window_end="2022-01-02",
    )
    rows = to_insert.collect()
    assert list(to_insert.columns) == COMMENTS_DDL_COLUMNS
    assert len(rows) == 1 and rows[0]["id"] == 101
    assert rows[0]["date_gmt"] == "2022-01-01 10:00:00"
    assert rows[0]["editable_until"] == "2022-01-01 10:30:00"
    assert json.loads(rows[0]["author"]) == {"display_name": "reader"}
    # manifest: only posts that produced >= 1 comment (post 2 had none,
    # post 2 was outside the window anyway)
    assert [r["post_id"] for r in manifest.collect()] == [1]


def test_default_page_fetcher_builds_reference_request():
    seen = {}

    def fake_get(url, headers, timeout):
        seen["url"], seen["headers"] = url, headers
        return {"posts": [{"id": 1}], "total": 1}

    fetch = contracts.default_page_fetcher(transport=fake_get)
    assert fetch(1) == [{"id": 1}]
    # the reference's exact request shape (posts_pipeline.py:26)
    assert seen["url"] == (
        "https://www.techinasia.com/wp-json/techinasia/2.0/posts?page=1&per_page=30"
    )
    assert seen["headers"]["Content-Type"] == "application/json"
    assert "User-Agent" in seen["headers"]


def test_default_key_fetcher_builds_reference_request():
    seen = {}

    def fake_get(url, headers, timeout):
        seen["url"] = url
        return {"comments": []}

    fetch = contracts.default_key_fetcher(transport=fake_get)
    # empty envelope -> [] (the reference's empty-list guard input)
    assert fetch(42) == []
    assert seen["url"] == "https://www.techinasia.com/wp-json/techinasia/2.0/posts/42/comments"


def test_pipeline_none_defaults_resolve_to_contract(monkeypatch, spark):
    """posts_pipeline(spark, None, None, existing) must run the whole
    default path: contract schema + default fetcher (network stubbed
    via the factory so the stub ships to executors by value)."""
    real_factory = contracts.default_page_fetcher

    page1 = {"posts": [_fake_post(7)]}

    def fake_transport(url, headers, timeout):
        # defined in-test over plain data: cloudpickle ships by value
        return page1 if "page=1" in url else {"posts": []}

    monkeypatch.setattr(
        contracts,
        "default_page_fetcher",
        lambda **kw: real_factory(transport=fake_transport, **kw),
    )
    existing = spark.createDataFrame([], contracts.POSTS_SCHEMA).selectExpr(
        "*", "cast(0 as bigint) AS word_count"
    )
    out = posts_pipeline(spark, None, None, existing)
    rows = out.collect()
    assert list(out.columns) == POSTS_DDL_COLUMNS
    assert len(rows) == 1 and rows[0]["id"] == 7

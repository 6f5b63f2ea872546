"""Bucketed co-located joins: the no-shuffle property, proven on plans."""

import os

import pytest
from pyspark.sql import functions as F

from loc2vec_spark import storage


@pytest.fixture(scope="module")
def warehouse(spark, fixture_dir):
    # session warehouse dir is fixed at session start; use a schema to
    # isolate these tables instead. Tables are created here (not in a
    # test) so every test is runnable in isolation.
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets_test")
    images = spark.read.parquet(os.path.join(fixture_dir, "images.parquet"))
    storage.write_bucketed(images.select("image_id", "phash"),
                           "buckets_test.ids_b",
                           bucket_col="image_id", n_buckets=8)
    storage.write_bucketed(images.select("image_id", "caption"),
                           "buckets_test.caps_b",
                           bucket_col="image_id", n_buckets=8)
    yield "buckets_test"
    spark.sql("DROP DATABASE IF EXISTS buckets_test CASCADE")


def test_bucketed_join_has_no_exchange(spark, warehouse, fixture_dir):
    images = spark.read.parquet(os.path.join(fixture_dir, "images.parquet"))
    a = storage.read_table(spark, f"{warehouse}.ids_b")
    b = storage.read_table(spark, f"{warehouse}.caps_b")
    assert storage.bucketed_join_is_shuffle_free(a, b, "image_id")
    # and the join is still correct
    assert a.join(b, "image_id").count() == images.count()


def test_unbucketed_join_does_shuffle(spark, fixture_dir):
    images = spark.read.parquet(os.path.join(fixture_dir, "images.parquet"))
    a = images.select("image_id", "phash")
    b = images.select("image_id", "caption")
    assert not storage.bucketed_join_is_shuffle_free(a, b, "image_id")


def test_mismatched_bucket_counts_still_correct(spark, warehouse,
                                                fixture_dir):
    images = spark.read.parquet(os.path.join(fixture_dir, "images.parquet"))
    storage.write_bucketed(images.select("image_id", "w"),
                           f"{warehouse}.w4", bucket_col="image_id",
                           n_buckets=4)
    a = storage.read_table(spark, f"{warehouse}.w4")
    b = storage.read_table(spark, f"{warehouse}.caps_b")
    joined = a.join(b, "image_id")
    assert joined.count() == images.count()

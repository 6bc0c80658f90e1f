import os
import shutil

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test sessions light


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from search_engine_spark.session import get_spark

    # warehouse + metastore under tmp so bucketed saveAsTable tests never
    # write into the repo cwd
    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        "tests",
        cpus=int(os.environ["SPARK_GRAFT_CPUS"]),
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": str(wh / "spark-warehouse"),
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={wh}",
        },
    )
    yield s


@pytest.fixture(scope="session")
def webtext_tiny(tmp_path_factory):
    """1,000-row corpus parquet (FIXTURES.md 'tiny')."""
    from search_engine_spark.fixtures import write_webtext_parquet

    path = str(tmp_path_factory.mktemp("corpus") / "webtext_tiny")
    write_webtext_parquet(path, 1000)
    return path


@pytest.fixture(scope="session")
def oracle_tiny(webtext_tiny):
    import pyarrow.parquet as pq

    from search_engine_spark.oracle import OracleIndex

    tbl = pq.read_table(os.path.join(webtext_tiny, "part-00000.parquet"))
    return OracleIndex(list(zip(tbl.column("url").to_pylist(), tbl.column("text").to_pylist())))


@pytest.fixture(scope="session")
def index_tiny(spark, webtext_tiny, tmp_path_factory):
    """Built index over the tiny corpus, small grid so WAND has real ranges."""
    from search_engine_spark.index.builder import BuildConfig, build_index

    index_dir = str(tmp_path_factory.mktemp("index") / "tiny")
    cfg = BuildConfig(
        block_docs=64, target_ranges=16, min_range_docs=64, n_partitions=8, waves=2
    )
    metrics = build_index(spark, webtext_tiny, index_dir, cfg=cfg)
    assert metrics["n_docs"] == 1000
    return index_dir


@pytest.fixture()
def clean_dir(tmp_path):
    d = tmp_path / "work"
    d.mkdir()
    yield str(d)
    shutil.rmtree(str(d), ignore_errors=True)


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR

import pytest


@pytest.fixture(scope="session")
def spark():
    from uniparser_spark.engine.session import get_spark

    session = get_spark(master="local[4]", shuffle_partitions=8)
    yield session
    session.stop()

import json
import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ocrspark.session import get_spark  # noqa: E402

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("OCRSPARK_MASTER", "local[4]")
    s = get_spark(app="ocrspark-tests", master=os.environ["OCRSPARK_MASTER"],
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def golden():
    return json.load(open(FIXTURES / "golden_ifyx1000.json", encoding="utf-8"))


@pytest.fixture(scope="session")
def golden_spans(golden):
    return [(c["kind"], c["text"], c["media_ref"], c["offset"])
            for c in golden["containers"]]


@pytest.fixture(scope="session")
def golden_docs_df(spark, golden, golden_spans):
    from ocrspark.schema import DOCS_SCHEMA
    return spark.createDataFrame(
        [{"doc_id": golden["doc_id"],
          "spans": [{"kind": k, "text": t, "media_ref": m, "offset": o}
                    for k, t, m, o in golden_spans]}],
        schema=DOCS_SCHEMA,
    )

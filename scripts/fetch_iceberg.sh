#!/usr/bin/env bash
# Fetch the Apache Iceberg Spark runtime jar so the IcebergStore path
# (ocrspark/io.py) runs for real: MERGE INTO upserts, bucket(N, doc_id)
# hidden partitioning, ALTER TABLE ADD COLUMNS migration.
#
# This sandbox has no network (probe: curl repo1.maven.org -> 000), so the
# in-repo CI keeps tests/test_resume.py::test_iceberg_store_roundtrip as a
# clean skip until this script has run.  On any machine with Maven Central
# access:
#
#   scripts/fetch_iceberg.sh            # downloads into ./dist/jars
#   ICEBERG_JAR=dist/jars/iceberg-spark-runtime-*.jar \
#       python -m pytest tests/test_resume.py -k iceberg -x -q
#
# Coordinates: org.apache.iceberg:iceberg-spark-runtime-<spark.minor>_<scala>
# PySpark here is 4.1.x / Scala 2.13; pick the newest Iceberg release that
# ships a matching runtime artifact (1.10+ ships runtime-4.0_2.13; check
# https://repo1.maven.org/maven2/org/apache/iceberg/ for runtime-4.1).
set -euo pipefail

SPARK_MINOR="${SPARK_MINOR:-4.1}"
SCALA="${SCALA:-2.13}"
ICEBERG_VERSION="${ICEBERG_VERSION:-1.11.0}"
OUT_DIR="$(dirname "$0")/../dist/jars"
ARTIFACT="iceberg-spark-runtime-${SPARK_MINOR}_${SCALA}"
URL="https://repo1.maven.org/maven2/org/apache/iceberg/${ARTIFACT}/${ICEBERG_VERSION}/${ARTIFACT}-${ICEBERG_VERSION}.jar"

mkdir -p "$OUT_DIR"
echo "fetching $URL"
curl -fL -o "$OUT_DIR/${ARTIFACT}-${ICEBERG_VERSION}.jar" "$URL"
echo "ok: $OUT_DIR/${ARTIFACT}-${ICEBERG_VERSION}.jar"
echo "run: ICEBERG_JAR=$OUT_DIR/${ARTIFACT}-${ICEBERG_VERSION}.jar python -m pytest tests/test_resume.py -k iceberg -x -q"

"""Stream-name extraction from a Kinesis consumer ARN.

Reference: ``Handler.java:169-171`` — split on ``:`` take index 5, then
split on ``/`` take index 1.  Golden test (HandlerTest.java:42-46):

    arn:aws:kinesis:us-east-1:1000000000:stream/kds-stream-1/consumer/kds-replicator:843564834
    → kds-stream-1

Pure built-in expression → whole-stage codegen, no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def stream_name_from_arn(arn: Column) -> Column:
    return F.element_at(F.split(F.element_at(F.split(arn, ":"), 6), "/"), 2)

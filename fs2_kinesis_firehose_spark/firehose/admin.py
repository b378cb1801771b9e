"""Control plane with the reference's 404-tolerant contract.

- ``none_on_404`` ← ``handle404`` (ErrorUtils.scala:26-34): a missing delivery
  stream yields ``None`` instead of raising; every other error propagates.
- admin functions ← the Firehose algebra's control-plane ops
  (Firehose.scala:36-56, impls :107-140).
- ``delivery_stream`` ← ``streamAsResource`` (FirehoseOps.scala:32-40):
  create-on-enter / delete-on-exit bracketed lifecycle.

Driver-side plain Python (no cluster involvement) — SURVEY.md §3 EP3.
"""

from __future__ import annotations

import functools
from contextlib import contextmanager
from typing import Any, Callable, Iterator, TypeVar

from fs2_kinesis_firehose_spark.firehose.client import is_resource_not_found

T = TypeVar("T")


def none_on_404(fn: Callable[..., T]) -> Callable[..., T | None]:
    """handle404 analog: ResourceNotFound → None, other errors propagate."""

    @functools.wraps(fn)
    def wrapper(*args: Any, **kwargs: Any) -> T | None:
        try:
            return fn(*args, **kwargs)
        except Exception as e:
            if is_resource_not_found(e):
                return None
            raise

    return wrapper


def create_stream(client: Any, name: str, stream_type: str = "DirectPut", **kwargs: Any) -> dict:
    return client.create_delivery_stream(
        DeliveryStreamName=name, DeliveryStreamType=stream_type, **kwargs
    )


@none_on_404
def delete_stream(client: Any, name: str) -> dict | None:
    return client.delete_delivery_stream(DeliveryStreamName=name)


@none_on_404
def describe_stream(client: Any, name: str) -> dict | None:
    return client.describe_delivery_stream(DeliveryStreamName=name)


def list_streams(client: Any) -> list[str]:
    return list(client.list_delivery_streams()["DeliveryStreamNames"])


@none_on_404
def list_tags(client: Any, name: str) -> list[dict] | None:
    return client.list_tags_for_delivery_stream(DeliveryStreamName=name)["Tags"]


@none_on_404
def tag_stream(client: Any, name: str, tags: dict[str, str]) -> dict | None:
    return client.tag_delivery_stream(
        DeliveryStreamName=name, Tags=[{"Key": k, "Value": v} for k, v in tags.items()]
    )


@none_on_404
def untag_stream(client: Any, name: str, keys: list[str]) -> dict | None:
    return client.untag_delivery_stream(DeliveryStreamName=name, TagKeys=keys)


@none_on_404
def start_encryption(client: Any, name: str, **kwargs: Any) -> dict | None:
    return client.start_delivery_stream_encryption(DeliveryStreamName=name, **kwargs)


@none_on_404
def stop_encryption(client: Any, name: str) -> dict | None:
    return client.stop_delivery_stream_encryption(DeliveryStreamName=name)


@none_on_404
def update_destination(client: Any, name: str, **kwargs: Any) -> dict | None:
    return client.update_destination(DeliveryStreamName=name, **kwargs)


@contextmanager
def delivery_stream(client: Any, name: str, **kwargs: Any) -> Iterator[dict]:
    """Bracketed create/use/delete (streamAsResource, FirehoseOps.scala:32-40)."""
    result = create_stream(client, name, **kwargs)
    try:
        yield result
    finally:
        delete_stream(client, name)

"""Firehose client abstraction: boto3-shaped duck type + a failure-injecting
in-memory fake.

The reference wraps the AWS SDK client behind an algebra (Firehose.scala:28-63)
and manages its lifecycle as a Resource (Firehose.scala:143-151).  Here the
contract is simply "anything boto3-firehose-shaped"; executors build their own
client via a picklable zero-arg factory (per-executor singleton — the analog of
the reference's client Resource, SURVEY.md §2 A22).

``FakeFirehose`` is the test double the reference lacks (SURVEY.md §5
"notably untested"): it injects per-record partial failures and whole-call
faults deterministically, and can spool delivered records to a directory so
Spark executor processes and the driver-side test can share observations.
"""

from __future__ import annotations

import os
import threading
import uuid
from collections import defaultdict
from typing import Any, Callable

ClientFactory = Callable[[], Any]


class ResourceNotFoundError(Exception):
    """Engine-level analog of AWS ResourceNotFoundException."""


def is_resource_not_found(exc: BaseException) -> bool:
    """True for our fake's error AND botocore's ClientError with the matching
    code (the reference matches on the SDK exception type, ErrorUtils.scala:28)."""
    if isinstance(exc, ResourceNotFoundError):
        return True
    response = getattr(exc, "response", None)
    if isinstance(response, dict):
        return response.get("Error", {}).get("Code") == "ResourceNotFoundException"
    return exc.__class__.__name__ == "ResourceNotFoundException"


def boto3_client_factory(region_name: str | None = None, **kwargs: Any) -> ClientFactory:
    """Factory for the real AWS client (import gated: boto3 is optional).

    Returns a class instance (not a closure) exposing ``kwargs`` so the
    per-executor client cache can key on stable configuration rather than
    object identity (closures unpickle to fresh objects per task and id()
    can alias after GC)."""
    return _Boto3Factory({"region_name": region_name, **kwargs})


class _Boto3Factory:
    def __init__(self, kwargs: dict[str, Any]) -> None:
        self.kwargs = kwargs

    def __call__(self) -> Any:
        try:
            import boto3  # type: ignore[import-not-found]
        except ImportError as e:  # pragma: no cover - boto3 absent in CI
            raise RuntimeError(
                "boto3 is not installed; use FakeFirehose for local runs"
            ) from e
        return boto3.client("firehose", **self.kwargs)


class FakeFirehose:
    """In-memory boto3-firehose-shaped fake with deterministic fault injection.

    Failure injection:
    - ``fail_record_times``: a record payload fails (RecordId omitted in the
      response entry) the first N times it is submitted — exercises the
      shrink-to-failed retry path (Firehose.scala:86-97 semantics).
    - ``raise_call_times``: the first N ``put_record_batch`` calls raise —
      exercises the whole-call retry path (Firehose.scala:99-103).
    - ``record_should_fail``: arbitrary predicate ``(payload, attempt) -> bool``.

    ``spool_dir`` persists each successful record as a line in a per-stream
    spool file so delivery is observable across process boundaries (Spark
    executors run in separate Python workers).
    """

    def __init__(
        self,
        *,
        fail_record_times: int = 0,
        raise_call_times: int = 0,
        record_should_fail: Callable[[bytes, int], bool] | None = None,
        spool_dir: str | None = None,
    ) -> None:
        self._lock = threading.Lock()
        self.streams: dict[str, dict[str, Any]] = {}
        self.delivered: dict[str, list[bytes]] = defaultdict(list)
        self.put_batch_calls = 0
        self._record_attempts: dict[bytes, int] = defaultdict(int)
        self._fail_record_times = fail_record_times
        self._raise_call_times = raise_call_times
        self._record_should_fail = record_should_fail
        self._spool_dir = spool_dir
        if spool_dir:
            os.makedirs(spool_dir, exist_ok=True)

    # -- helpers ------------------------------------------------------------
    def _require_stream(self, name: str) -> dict[str, Any]:
        if name not in self.streams:
            raise ResourceNotFoundError(f"delivery stream not found: {name}")
        return self.streams[name]

    def _spool(self, stream: str, payload: bytes) -> None:
        if self._spool_dir:
            path = os.path.join(self._spool_dir, f"{stream}.spool")
            with open(path, "ab") as f:
                f.write(len(payload).to_bytes(4, "big") + payload)

    def _record_fails(self, payload: bytes) -> bool:
        attempt = self._record_attempts[payload]
        self._record_attempts[payload] += 1
        if self._record_should_fail is not None:
            return self._record_should_fail(payload, attempt)
        return attempt < self._fail_record_times

    # -- data plane (boto3 shape) --------------------------------------------
    def put_record(self, DeliveryStreamName: str, Record: dict[str, bytes]) -> dict[str, Any]:
        with self._lock:
            if DeliveryStreamName in self.streams:
                self._require_stream(DeliveryStreamName)
            payload = bytes(Record["Data"])
            self.delivered[DeliveryStreamName].append(payload)
            self._spool(DeliveryStreamName, payload)
            return {"RecordId": uuid.uuid4().hex, "Encrypted": False}

    def put_record_batch(
        self, DeliveryStreamName: str, Records: list[dict[str, bytes]]
    ) -> dict[str, Any]:
        with self._lock:
            if len(Records) > 500:
                raise ValueError("PutRecordBatch accepts at most 500 records")
            self.put_batch_calls += 1
            if self.put_batch_calls <= self._raise_call_times:
                raise ConnectionError("injected transport failure")
            responses: list[dict[str, Any]] = []
            failed = 0
            for rec in Records:
                payload = bytes(rec["Data"])
                if self._record_fails(payload):
                    failed += 1
                    responses.append(
                        {"ErrorCode": "ServiceUnavailableException", "ErrorMessage": "injected"}
                    )
                else:
                    self.delivered[DeliveryStreamName].append(payload)
                    self._spool(DeliveryStreamName, payload)
                    responses.append({"RecordId": uuid.uuid4().hex})
            return {"FailedPutCount": failed, "RequestResponses": responses}

    # -- control plane (boto3 shape; 404 contract per Firehose.scala:36-56) ---
    def create_delivery_stream(self, **kwargs: Any) -> dict[str, Any]:
        with self._lock:
            name = kwargs["DeliveryStreamName"]
            self.streams[name] = {
                "DeliveryStreamName": name,
                "DeliveryStreamType": kwargs.get("DeliveryStreamType", "DirectPut"),
                "DeliveryStreamStatus": "ACTIVE",
                "DeliveryStreamEncryptionConfiguration": {"Status": "DISABLED"},
                "Tags": {},
                "Destinations": [kwargs.get("ExtendedS3DestinationConfiguration", {})],
            }
            return {"DeliveryStreamARN": f"arn:aws:firehose:local::deliverystream/{name}"}

    def delete_delivery_stream(self, DeliveryStreamName: str, **_: Any) -> dict[str, Any]:
        with self._lock:
            self._require_stream(DeliveryStreamName)
            del self.streams[DeliveryStreamName]
            return {}

    def describe_delivery_stream(self, DeliveryStreamName: str, **_: Any) -> dict[str, Any]:
        with self._lock:
            return {"DeliveryStreamDescription": dict(self._require_stream(DeliveryStreamName))}

    def list_delivery_streams(self, **_: Any) -> dict[str, Any]:
        with self._lock:
            return {
                "DeliveryStreamNames": sorted(self.streams),
                "HasMoreDeliveryStreams": False,
            }

    def list_tags_for_delivery_stream(self, DeliveryStreamName: str, **_: Any) -> dict[str, Any]:
        with self._lock:
            stream = self._require_stream(DeliveryStreamName)
            tags = [{"Key": k, "Value": v} for k, v in sorted(stream["Tags"].items())]
            return {"Tags": tags, "HasMoreTags": False}

    def tag_delivery_stream(
        self, DeliveryStreamName: str, Tags: list[dict[str, str]], **_: Any
    ) -> dict[str, Any]:
        with self._lock:
            stream = self._require_stream(DeliveryStreamName)
            for t in Tags:
                stream["Tags"][t["Key"]] = t.get("Value", "")
            return {}

    def untag_delivery_stream(
        self, DeliveryStreamName: str, TagKeys: list[str], **_: Any
    ) -> dict[str, Any]:
        with self._lock:
            stream = self._require_stream(DeliveryStreamName)
            for k in TagKeys:
                stream["Tags"].pop(k, None)
            return {}

    def start_delivery_stream_encryption(self, DeliveryStreamName: str, **_: Any) -> dict[str, Any]:
        with self._lock:
            stream = self._require_stream(DeliveryStreamName)
            stream["DeliveryStreamEncryptionConfiguration"] = {"Status": "ENABLED"}
            return {}

    def stop_delivery_stream_encryption(self, DeliveryStreamName: str, **_: Any) -> dict[str, Any]:
        with self._lock:
            stream = self._require_stream(DeliveryStreamName)
            stream["DeliveryStreamEncryptionConfiguration"] = {"Status": "DISABLED"}
            return {}

    def update_destination(self, DeliveryStreamName: str, **kwargs: Any) -> dict[str, Any]:
        with self._lock:
            stream = self._require_stream(DeliveryStreamName)
            stream["Destinations"] = [kwargs]
            return {}


def read_spool(spool_dir: str, stream: str) -> list[bytes]:
    """Read back records spooled by FakeFirehose (length-prefixed framing)."""
    path = os.path.join(spool_dir, f"{stream}.spool")
    if not os.path.exists(path):
        return []
    out: list[bytes] = []
    with open(path, "rb") as f:
        data = f.read()
    i = 0
    while i < len(data):
        n = int.from_bytes(data[i : i + 4], "big")
        out.append(data[i + 4 : i + 4 + n])
        i += 4 + n
    return out


def fake_client_factory(**kwargs: Any) -> ClientFactory:
    """Picklable factory: each executor builds its own FakeFirehose (state is
    per-process; use ``spool_dir`` for cross-process observation)."""
    return _FakeFactory(kwargs)


class _FakeFactory:
    def __init__(self, kwargs: dict[str, Any]) -> None:
        self.kwargs = kwargs

    def __call__(self) -> FakeFirehose:
        return FakeFirehose(**self.kwargs)

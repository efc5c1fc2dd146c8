"""Client SDKs for the serving endpoint.

The reference ships java/go/python client SDKs for its processor
(``serving/sdk/``) on top of a C ABI (``serving/processor/serving/
processor.h:4-12``). Here the serving boundary is HTTP/JSON
(``serving.processor.HttpScorer``), so the SDKs are thin clients of
that wire protocol:

  * :class:`Client` — Python, stdlib-only (this module).
  * ``c/deeprec_client.{h,c}`` — C99 + POSIX sockets, for embedding in
    arbitrary native RPC frameworks (the processor.h role); compiled
    and exercised in ``tests/test_serving_sdk.py``.

Wire protocol (any language): ``POST /v1/predict`` with
``{"instances": [...]}`` returns ``{"predictions": [...]}``;
``GET /healthz`` returns ``{"status": "ok", "version": N}``.
"""

from deeprec_tpu.serving.sdk.client import Client

__all__ = ["Client"]

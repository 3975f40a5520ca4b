"""Auto-imported at interpreter startup when this dir is on PYTHONPATH
(i.e. in Spark Python workers spawned for the TWS tests). Forces the
pure-Python protobuf implementation (the SDK copy has no compiled upb
for this interpreter) and no-ops the gencode/runtime version gate; see
README.md for why this is sound."""
import os

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
try:
    from google.protobuf import runtime_version as _rv

    _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
except Exception:  # no SDK protobuf here — shim inert
    pass

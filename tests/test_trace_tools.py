"""Unit tests for scripts/trace_kernels.py's pure parsing/classification
helpers (the capture path itself needs the real TPU; its output tables
live in docs/BENCH.md)."""

import importlib.util
import sys
from pathlib import Path

spec = importlib.util.spec_from_file_location(
    "trace_kernels", Path(__file__).resolve().parents[1] / "scripts" / "trace_kernels.py"
)
tk = importlib.util.module_from_spec(spec)
sys.modules["trace_kernels"] = tk
spec.loader.exec_module(tk)


def test_result_shapes_tuple_and_single():
    name = ("%closed_call.78 = (f32[3,512,256]{2,1,0:T(8,128)}, "
            "f32[3,512,256]{2,1,0:T(8,128)}) custom-call(f32[2,512,256]{} %x)")
    assert tk._result_shapes(name) == [(3, 512, 256), (3, 512, 256)]
    single = "%closed_call.75 = f32[2,512,256]{2,1,0:T(8,128)S(1)} custom-call(%a)"
    assert tk._result_shapes(single) == [(2, 512, 256)]


def _cc(result):
    return f"%closed_call.9 = {result} custom-call(%a, %b), custom_call_target=\"tpu_custom_call\""


def test_classify_pallas_signatures():
    f2 = "f32[2,512,256]{2,1,0:T(8,128)}"
    f3 = "f32[3,512,256]{2,1,0:T(8,128)}"
    fs = "f32[512,256]{1,0:T(8,128)}"
    assert tk.classify(_cc("(" + ", ".join([f2] * 6) + ")"), "cip") == "pallas:cip_velocity"
    assert tk.classify(_cc("(" + ", ".join([f3] * 6) + ")"), "cip") == "pallas:cip_dye"
    assert tk.classify(_cc(f2), "cip") == "pallas:confinement"
    assert tk.classify(_cc(f"({fs}, {fs})"), "cip") == "pallas:sor_iter"
    assert tk.classify(_cc(f"({fs}, {fs}, {f2})"), "cip") == "pallas:sor_final_limit"
    assert tk.classify(_cc(f"({f2}, {f2})"), "upwind") == "pallas:mac_velocity"
    assert tk.classify(_cc(f"({f3}, {f3})"), "kk") == "pallas:mac_dye"


def test_classify_op_buckets():
    assert tk.classify("%while.2 = (s32[]{}) while(%x)", "cip") == "_control"
    assert tk.classify("%fusion.3 = f32[8,8]{} fusion(%x), kind=kLoop", "cip") == "xla_fusion"
    assert tk.classify("%copy.90 = f32[8,8]{} copy(%x)", "cip") == "copy"
    assert tk.classify(
        "%slice-start.18 = ((f32[2,8,8]{})) async-start(%x)", "cip"
    ) == "async_dma"
    assert tk.classify(
        "%custom-call.6 = f32[2,8,8]{} custom-call(%a), custom_call_target=\"ConcatBitcast\"",
        "cip",
    ) == "async_dma"

"""Process-graph compiler vs the reference's builder-test expectations
(TestOpenEOProcessScriptBuilder.java patterns: exact output arrays + output
cell types)."""

import numpy as np
import pytest

from openeo_geotrellis_extensions_spark.functions.process_compiler import (
    ProcessCompileError,
    compile_process_graph,
)


def g1(pid, **args):
    return {"n": {"process_id": pid, "arguments": args, "result": True}}


X = {"from_parameter": "x"}
Y = {"from_parameter": "y"}
DATA = {"from_parameter": "data"}


def test_ndvi_graph():
    graph = {
        "nir": {"process_id": "array_element", "arguments": {"data": DATA, "index": 1}},
        "red": {"process_id": "array_element", "arguments": {"data": DATA, "index": 0}},
        "nd": {
            "process_id": "normalized_difference",
            "arguments": {"x": {"from_node": "nir"}, "y": {"from_node": "red"}},
            "result": True,
        },
    }
    c = compile_process_graph(graph)
    red = np.array([[1.0, 2.0]])
    nir = np.array([[3.0, 2.0]])
    out = c.fn({"data": np.stack([red, nir])})
    np.testing.assert_allclose(out, [[0.5, 0.0]])
    assert c.output_cell_type == "float32"


def test_comparison_nan_propagates_and_bool_type():
    c = compile_process_graph(g1("gt", x=X, y=5))
    out = c.fn({"x": np.array([1.0, 9.0, np.nan])})
    np.testing.assert_array_equal(out[:2], [0.0, 1.0])
    assert np.isnan(out[2])
    assert c.output_cell_type == "bool"


def test_if_with_condition():
    graph = {
        "c": {"process_id": "lt", "arguments": {"x": X, "y": 3}},
        "i": {
            "process_id": "if",
            "arguments": {"value": {"from_node": "c"}, "accept": 100, "reject": {"from_parameter": "x"}},
            "result": True,
        },
    }
    c = compile_process_graph(graph)
    out = c.fn({"x": np.array([1.0, 5.0])})
    np.testing.assert_array_equal(out, [100.0, 5.0])


def test_reducers_ignore_nodata():
    data = np.array([[1.0, np.nan], [3.0, np.nan], [np.nan, np.nan]])
    assert compile_process_graph(g1("mean", data=DATA)).fn({"data": data})[0] == 2.0
    assert np.isnan(compile_process_graph(g1("mean", data=DATA)).fn({"data": data})[1])
    assert compile_process_graph(g1("max", data=DATA)).fn({"data": data})[0] == 3.0
    s = compile_process_graph(g1("sum", data=DATA)).fn({"data": data})
    assert s[0] == 4.0 and np.isnan(s[1])


def test_sum_of_two_params_list():
    c = compile_process_graph(g1("sum", data=[X, Y]))
    out = c.fn({"x": np.array([1.0, np.nan]), "y": np.array([2.0, 5.0])})
    np.testing.assert_array_equal(out, [3.0, 5.0])  # ignore_nodata default


def test_count_variants():
    data = np.array([[1.0, np.nan], [np.nan, np.nan], [5.0, 7.0]])
    c = compile_process_graph(g1("count", data=DATA))
    np.testing.assert_array_equal(c.fn({"data": data}), [2.0, 1.0])
    assert c.output_cell_type == "int32"
    c2 = compile_process_graph(g1("count", data=DATA, condition=True))
    np.testing.assert_array_equal(c2.fn({"data": data}), [3.0, 3.0])


def test_count_with_condition_graph():
    cond = {"process_graph": g1("gt", x=X, y=2)}
    c = compile_process_graph(g1("count", data=DATA, condition=cond))
    data = np.array([[1.0, 3.0], [4.0, 5.0], [0.0, 1.0]])
    np.testing.assert_array_equal(c.fn({"data": data}), [1.0, 2.0])


def test_array_interpolate_linear():
    c = compile_process_graph(g1("array_interpolate_linear", data=DATA))
    data = np.array([np.nan, 2.0, np.nan, np.nan, 8.0, np.nan])
    out = c.fn({"data": data})
    assert np.isnan(out[0]) and np.isnan(out[5])  # edges stay nodata
    np.testing.assert_allclose(out[1:5], [2.0, 4.0, 6.0, 8.0])


def test_quantiles():
    c = compile_process_graph(g1("quantiles", data=DATA, probabilities=[0.5]))
    out = c.fn({"data": np.array([1.0, 2.0, 3.0, 4.0])})
    assert out[0] == 2.5


def test_clip_linear_scale():
    c = compile_process_graph(g1("clip", x=X, min=0, max=10))
    np.testing.assert_array_equal(c.fn({"x": np.array([-5.0, 5.0, 15.0])}), [0, 5, 10])
    c2 = compile_process_graph(
        g1("linear_scale_range", x=X, inputMin=0, inputMax=10, outputMin=0, outputMax=100)
    )
    np.testing.assert_array_equal(c2.fn({"x": np.array([-1.0, 5.0, 20.0])}), [0, 50, 100])


def test_logicals():
    c = compile_process_graph(g1("and", x=X, y=Y))
    out = c.fn({"x": np.array([1.0, 1.0, 0.0, np.nan]), "y": np.array([1.0, 0.0, 0.0, 1.0])})
    np.testing.assert_array_equal(out[:3], [1.0, 0.0, 0.0])
    assert np.isnan(out[3])
    c2 = compile_process_graph(g1("not", x=X))
    np.testing.assert_array_equal(c2.fn({"x": np.array([0.0, 2.0])}), [1.0, 0.0])


def test_all_any():
    data = np.array([[1.0, 0.0, np.nan], [1.0, 1.0, np.nan]])
    a = compile_process_graph(g1("all", data=DATA)).fn({"data": data})
    np.testing.assert_array_equal(a[:2], [1.0, 0.0])
    assert np.isnan(a[2])


def test_first_last_ignore_nodata():
    data = np.array([np.nan, 2.0, 3.0, np.nan])
    assert compile_process_graph(g1("first", data=DATA)).fn({"data": data}) == 2.0
    assert compile_process_graph(g1("last", data=DATA)).fn({"data": data}) == 3.0


def test_math_chain():
    graph = {
        "a": {"process_id": "add", "arguments": {"x": X, "y": 1}},
        "b": {"process_id": "sqrt", "arguments": {"x": {"from_node": "a"}}},
        "c": {"process_id": "multiply", "arguments": {"x": {"from_node": "b"}, "y": 10}, "result": True},
    }
    out = compile_process_graph(graph).fn({"x": np.array([3.0, 8.0])})
    np.testing.assert_allclose(out, [20.0, 30.0])


def test_array_apply():
    proc = {"process_graph": g1("multiply", x=X, y=2)}
    c = compile_process_graph(g1("array_apply", data=DATA, process=proc))
    out = c.fn({"data": np.array([[1.0], [2.0]])})
    np.testing.assert_array_equal(out, [[2.0], [4.0]])


def test_unknown_process_raises():
    with pytest.raises(ProcessCompileError):
        compile_process_graph(g1("warp_drive", x=X))


def test_between():
    c = compile_process_graph(g1("between", x=X, min=2, max=4))
    out = c.fn({"x": np.array([1.0, 2.0, 4.0, 5.0])})
    np.testing.assert_array_equal(out, [0.0, 1.0, 1.0, 0.0])

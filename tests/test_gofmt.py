"""Golden tests for Go-compatible value rendering (gofmt.py).

Expected strings are what Go produces for fmt.Sprintf("%v", float64(x))
(strconv 'g' shortest, eprec=6) and encoding/json.Marshal — the
stringification semantics of /root/reference/main.go:281-295.
"""

from otel_logger_spark.gofmt import go_float_g, go_json_dumps, go_json_float, go_v, render_attr


def test_go_float_g_fixed():
    assert go_float_g(42.0) == "42"
    assert go_float_g(3.14) == "3.14"
    assert go_float_g(0.0) == "0"
    assert go_float_g(-2.5) == "-2.5"
    assert go_float_g(123456.0) == "123456"
    assert go_float_g(0.0001) == "0.0001"
    assert go_float_g(258327.9) == "258327.9"


def test_go_float_g_scientific():
    # Go switches to %e at |x| >= 1e6 for shortest-'g'
    assert go_float_g(1234567.0) == "1.234567e+06"
    assert go_float_g(1e6) == "1e+06"
    assert go_float_g(0.00001) == "1e-05"
    assert go_float_g(1e21) == "1e+21"
    assert go_float_g(-1234567.0) == "-1.234567e+06"
    assert go_float_g(1705315853.0) == "1.705315853e+09"


def test_go_json_float():
    # json keeps fixed notation through 1e20
    assert go_json_float(1234567.0) == "1234567"
    assert go_json_float(42.0) == "42"
    assert go_json_float(4725.163) == "4725.163"
    assert go_json_float(0.123) == "0.123"
    assert go_json_float(1e21) == "1e+21"
    assert go_json_float(1e-7) == "1e-7"  # json trims e-07 -> e-7


def test_go_v_scalars():
    assert go_v("x") == "x"
    assert go_v(True) == "true"
    assert go_v(False) == "false"
    assert go_v(None) == "<nil>"
    # json.Unmarshal makes every number float64; %v then uses 'g'
    assert go_v(8080) == "8080"
    assert go_v(12345678) == "1.2345678e+07"


def test_go_json_dumps_sorted_compact():
    assert go_json_dumps({"b": 1, "a": {"z": True, "y": None}}) == '{"a":{"y":null,"z":true},"b":1}'
    assert go_json_dumps([1, 2.5, "s"]) == '[1,2.5,"s"]'


def test_go_json_html_escaping():
    assert go_json_dumps("<a>&") == '"\\u003ca\\u003e\\u0026"'
    assert go_json_dumps("tab\there\nnl") == '"tab\\there\\nnl"'


def test_render_attr():
    assert render_attr({"rss": 1024, "heap": 512}) == '{"heap":512,"rss":1024}'
    assert render_attr([1, 2, 3]) == "[1,2,3]"
    assert render_attr("plain") == "plain"
    assert render_attr(99.5) == "99.5"

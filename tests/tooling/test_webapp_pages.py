"""Import smoke test for the Streamlit pages (VERDICT r2 item 9).

The three pages + the TensorBoard embed (~350 LoC) execute top-to-bottom on
import under Streamlit; this image has no streamlit, so CI never touched
them — a syntax or API break would ship silently. This test installs a
minimal streamlit stub (widgets return their defaults, buttons return
False so the heavy training block is skipped, ``st.stop()`` raises the
same control-flow exception real streamlit uses) and executes each page
module end-to-end.
"""

import importlib.util
import pathlib
import sys
import types

import pytest

REPO = pathlib.Path(__file__).resolve().parents[2]
PAGES = sorted((REPO / "web_app" / "pages").glob("*.py"))


class StopPage(Exception):
    """Stand-in for streamlit's ScriptControlException."""


class _Elem:
    """Placeholder / container element: context manager + chainable API."""

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        return _widget(name)

    def __iter__(self):
        return iter(())


def _widget(name):
    def call(*args, **kwargs):
        if name == "stop":
            raise StopPage()
        if name in ("selectbox", "radio", "select_slider"):
            opts = list(args[1]) if len(args) > 1 else []
            default = kwargs.get("index")
            if name == "select_slider" and len(args) > 2:
                return args[2]
            if default is not None and opts:
                return opts[default]
            return opts[0] if opts else None
        if name == "slider":
            if len(args) > 3:
                return args[3]
            return kwargs.get("value", args[1] if len(args) > 1 else 0)
        if name == "number_input":
            return kwargs.get("value", args[1] if len(args) > 1 else 0)
        if name == "text_input":
            return kwargs.get("value", "")
        if name in ("checkbox", "toggle", "button", "form_submit_button"):
            return kwargs.get("value", False)
        if name == "multiselect":
            return kwargs.get("default", [])
        if name == "columns":
            n = args[0]
            n = len(n) if isinstance(n, (list, tuple)) else int(n)
            return [_Elem() for _ in range(n)]
        if name == "tabs":
            return [_Elem() for _ in args[0]]
        return _Elem()
    return call


def _make_streamlit():
    st = types.ModuleType("streamlit")
    st.__getattr__ = lambda name: (_Elem() if name in ("sidebar",)
                                   else _widget(name))
    comps = types.ModuleType("streamlit.components")
    v1 = types.ModuleType("streamlit.components.v1")
    v1.iframe = _widget("iframe")
    v1.html = _widget("html")
    comps.v1 = v1
    st.components = comps
    return {"streamlit": st, "streamlit.components": comps,
            "streamlit.components.v1": v1}


@pytest.fixture()
def stub_streamlit(monkeypatch, tmp_path):
    for name, mod in _make_streamlit().items():
        monkeypatch.setitem(sys.modules, name, mod)
    # point the results root at an empty temp dir so `list_runs()` is empty
    # and run-dependent pages early-stop cleanly (never spawns tensorboard)
    import placement_tpu.webapp.data as data
    monkeypatch.setattr(data, "DEFAULT_RESULTS_ROOT", str(tmp_path))
    monkeypatch.syspath_prepend(str(REPO))


def _exec_module(path: pathlib.Path):
    spec = importlib.util.spec_from_file_location(
        f"webapp_smoke_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except StopPage:
        pass                      # st.stop() — normal early-exit control flow
    return mod


def test_pages_exist():
    assert len(PAGES) == 3, PAGES


@pytest.mark.parametrize("page", PAGES, ids=lambda p: p.stem)
def test_page_executes_under_stub(stub_streamlit, page):
    _exec_module(page)


def test_home_executes_under_stub(stub_streamlit):
    _exec_module(REPO / "web_app" / "home.py")


def test_tensorboard_embed_importable(stub_streamlit):
    mod = _exec_module(REPO / "web_app" / "streamlit_tensorboard.py")
    assert callable(mod.st_tensorboard)

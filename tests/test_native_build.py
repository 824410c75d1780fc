"""detr_tpu.utils.native_build: shared lazy build-and-load scaffolding."""

import ctypes
import os
import shutil

import pytest

from detr_tpu.utils.native_build import NativeLib

SRC = """
#include <cstdint>
extern "C" {
int the_answer(void) { return 42; }
%s
}
"""


def _have_cxx():
    return shutil.which("g++") or shutil.which("clang++") or shutil.which("c++")


@pytest.fixture
def cxx():
    if not _have_cxx():
        pytest.skip("no C++ toolchain")
    return True


def _bind(lib):
    lib.the_answer.restype = ctypes.c_int
    lib.second_symbol.restype = ctypes.c_int  # raises on a stale lib


def test_build_load_and_call(tmp_path, cxx):
    src = tmp_path / "mini.cc"
    src.write_text(SRC % "int second_symbol(void) { return 7; }")
    nl = NativeLib(str(src), ([],), _bind)
    lib = nl.load()
    assert lib is not None
    assert lib.the_answer() == 42
    assert lib.second_symbol() == 7
    # cached on second loader instance (no recompile needed to pass bind)
    nl2 = NativeLib(str(src), ([],), _bind)
    assert nl2.load() is not None


def test_source_change_gets_fresh_lib_same_process(tmp_path, cxx):
    """The cache filename is keyed on source CONTENT: after a source edit
    adding a symbol, a new NativeLib must load the new symbol even though
    the old library is still dlopen'd in this process (glibc caches dlopen
    by path, so an mtime-keyed same-name rebuild would silently keep
    serving the OLD symbols)."""
    src = tmp_path / "mini.cc"
    src.write_text(SRC % "")

    def bind_old(lib):
        lib.the_answer.restype = ctypes.c_int

    nl_old = NativeLib(str(src), ([],), bind_old)
    lib_old = nl_old.load()
    assert lib_old is not None and lib_old.the_answer() == 42

    src.write_text(SRC % "int second_symbol(void) { return 7; }")
    nl_new = NativeLib(str(src), ([],), _bind)
    lib_new = nl_new.load()
    assert lib_new is not None, "edited source must rebuild under a new name"
    assert lib_new.second_symbol() == 7
    # superseded variant was cleaned up
    libs = [p for p in os.listdir(tmp_path) if p.endswith(".so")]
    assert len(libs) == 1


def test_missing_toolchain_degrades_to_none(tmp_path, monkeypatch, cxx):
    src = tmp_path / "mini.cc"
    src.write_text(SRC % "int second_symbol(void) { return 7; }")
    monkeypatch.setenv("PATH", str(tmp_path))  # no compilers reachable
    nl = NativeLib(str(src), ([],), _bind)
    assert nl.load() is None


def test_no_tmp_leftovers_on_failed_compile(tmp_path, cxx):
    src = tmp_path / "broken.cc"
    src.write_text("this is not C++")
    nl = NativeLib(str(src), ([],), _bind)
    assert nl.load() is None
    assert not [p for p in os.listdir(tmp_path) if p.endswith(".tmp")]

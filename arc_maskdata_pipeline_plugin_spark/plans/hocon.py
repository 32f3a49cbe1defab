"""Minimal HOCON parser — enough for Arc pipeline configs.

Arc parses pipelines with Typesafe Config (HOCON), e.g. the reference's own
test config (MaskDataTransformSuite.scala:59-114). ``pyhocon`` is not in
this container, so this is a small recursive-descent implementation of the
HOCON subset those configs use:

* JSON superset (objects/arrays/strings/numbers/booleans/null)
* ``#`` and ``//`` comments
* unquoted keys, dotted path keys (``a.b.c = 1``), ``=`` for ``:``
* optional commas — newlines separate elements
* unquoted string values (to end of line / structural char)
* triple-quoted multi-line strings
* object merge for duplicated keys (scalars: last wins; objects: deep merge)
* ``key { ... }`` with no separator
* substitutions ``${path}`` (document root, then environment) and optional
  ``${?path}`` (absent → key dropped / empty string inside concatenation)

If ``pyhocon`` IS importable it is preferred (full spec); this module is the
fallback. Not supported here: includes, ``+=``, self-referential substitution
cycles (cycle → error).
"""

from __future__ import annotations

import json
import os
from typing import Any

__all__ = ["loads"]


class HoconError(ValueError):
    pass


class _Subst:
    __slots__ = ("path", "optional")

    def __init__(self, path: str, optional: bool):
        self.path = path
        self.optional = optional

    def __repr__(self):  # pragma: no cover
        return f"${{{'?' if self.optional else ''}{self.path}}}"


class _Concat:
    """Adjacent values on one line concatenate into a string."""

    __slots__ = ("parts",)

    def __init__(self, parts: list):
        self.parts = parts


_STRUCTURAL = set('{}[],:=#"')
_UNQUOTED_END = set("$\"{}[]:=,+#`^?!@*&\\")


class _Parser:
    def __init__(self, text: str):
        self.s = text
        self.i = 0
        self.n = len(text)

    # --- low-level -------------------------------------------------------
    def _peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def _skip_ws(self, newlines: bool = True) -> None:
        while self.i < self.n:
            c = self.s[self.i]
            if c == "#" or self.s[self.i : self.i + 2] == "//":
                while self.i < self.n and self.s[self.i] != "\n":
                    self.i += 1
            elif c == "\n" and not newlines:
                return
            elif c.isspace():
                self.i += 1
            else:
                return

    def _err(self, msg: str) -> HoconError:
        line = self.s.count("\n", 0, self.i) + 1
        return HoconError(f"{msg} at line {line}")

    # --- values ----------------------------------------------------------
    def parse(self):
        self._skip_ws()
        if self._peek() == "[":
            v = self._array()
        elif self._peek() == "{":
            v = self._object()
        else:  # braces-omitted root object
            v = self._object(braceless=True)
        self._skip_ws()
        if self.i < self.n:
            raise self._err(f"trailing content {self.s[self.i:self.i+20]!r}")
        return v

    def _object(self, braceless: bool = False) -> dict:
        out: dict[str, Any] = {}
        if not braceless:
            assert self._peek() == "{"
            self.i += 1
        while True:
            self._skip_ws()
            if self.i >= self.n:
                if braceless:
                    return out
                raise self._err("unterminated object")
            if self._peek() == "}":
                self.i += 1
                return out
            key = self._key()
            self._skip_ws(newlines=False)
            c = self._peek()
            if c == "{":  # key { ... } — merge form
                val = self._object()
            elif c in ":=":
                self.i += 1
                self._skip_ws(newlines=False)
                val = self._value()
            else:
                raise self._err(f"expected ':', '=' or '{{' after key {key!r}")
            self._merge_path(out, key.split("."), val)
            self._skip_ws(newlines=False)
            if self._peek() == ",":
                self.i += 1

    def _array(self) -> list:
        assert self._peek() == "["
        self.i += 1
        out: list = []
        while True:
            self._skip_ws()
            if self.i >= self.n:
                raise self._err("unterminated array")
            if self._peek() == "]":
                self.i += 1
                return out
            out.append(self._value())
            self._skip_ws(newlines=False)
            if self._peek() == ",":
                self.i += 1

    def _key(self) -> str:
        if self._peek() == '"':
            return self._quoted()
        start = self.i
        while self.i < self.n and (
            self.s[self.i].isalnum() or self.s[self.i] in "._-"
        ):
            self.i += 1
        if start == self.i:
            raise self._err(f"expected key, got {self._peek()!r}")
        return self.s[start : self.i]

    def _value(self):
        parts: list = []
        while True:
            c = self._peek()
            if c == "" or c in "\n,]}#":
                break
            if self.s[self.i : self.i + 2] == "//":
                break
            if c == '"':
                if self.s[self.i : self.i + 3] == '"""':
                    parts.append(self._triple_quoted())
                else:
                    parts.append(self._quoted())
            elif c == "{":
                parts.append(self._object())
            elif c == "[":
                parts.append(self._array())
            elif self.s[self.i : self.i + 2] == "${":
                parts.append(self._substitution())
            else:
                num = self._try_number()
                parts.append(self._unquoted_run() if num is None else num)
            # whitespace between parts stays significant for concatenation;
            # capture it raw
            ws_start = self.i
            while self.i < self.n and self.s[self.i] in " \t":
                self.i += 1
            if self.i > ws_start and self._peek() not in ("", "\n", ",", "]", "}", "#"):
                parts.append(self.s[ws_start : self.i])
        if not parts:
            raise self._err("expected value")
        if len(parts) == 1:
            return parts[0]
        # concatenation: whitespace-joined string (or merged objects)
        if all(isinstance(p, dict) for p in parts):
            merged: dict = {}
            for p in parts:
                self._deep_merge(merged, p)
            return merged
        return _Concat([p for p in parts])

    _NUMBER = None  # set after class body (regex)

    def _try_number(self):
        """Number token (incl. exponents like 1e+16, whose '+' the unquoted
        rules would otherwise reject). Only taken when the whole token is
        numeric and ends at a value boundary."""
        m = _Parser._NUMBER.match(self.s, self.i)
        if not m:
            return None
        self.i = m.end()
        raw = m.group(0)
        try:
            return int(raw)
        except ValueError:
            return float(raw)

    def _unquoted_run(self):
        start = self.i
        while self.i < self.n:
            c = self.s[self.i]
            if c in "\n,]}#" or c in _UNQUOTED_END or self.s[self.i : self.i + 2] == "//":
                break
            self.i += 1
        raw = self.s[start : self.i].rstrip()
        if raw == "":
            raise self._err("empty unquoted value")
        for lit, v in (("true", True), ("false", False), ("null", None)):
            if raw == lit:
                return v
        try:
            return int(raw)
        except ValueError:
            pass
        try:
            return float(raw)
        except ValueError:
            pass
        return raw

    def _quoted(self) -> str:
        assert self._peek() == '"'
        self.i += 1
        out = []
        while self.i < self.n:
            c = self.s[self.i]
            if c == '"':
                self.i += 1
                return "".join(out)
            if c == "\\":
                esc = self.s[self.i + 1]
                mapping = {'"': '"', "\\": "\\", "/": "/", "b": "\b", "f": "\f",
                           "n": "\n", "r": "\r", "t": "\t"}
                if esc == "u":
                    cp = int(self.s[self.i + 2 : self.i + 6], 16)
                    self.i += 6
                    # JSON encodes astral chars as surrogate pairs of two
                    # \uXXXX escapes — recombine them
                    if 0xD800 <= cp <= 0xDBFF and self.s[self.i : self.i + 2] == "\\u":
                        lo = int(self.s[self.i + 2 : self.i + 6], 16)
                        if 0xDC00 <= lo <= 0xDFFF:
                            self.i += 6
                            cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                    out.append(chr(cp))
                    continue
                if esc not in mapping:
                    raise self._err(f"bad escape \\{esc}")
                out.append(mapping[esc])
                self.i += 2
                continue
            out.append(c)
            self.i += 1
        raise self._err("unterminated string")

    def _triple_quoted(self) -> str:
        self.i += 3
        end = self.s.find('"""', self.i)
        if end < 0:
            raise self._err("unterminated triple-quoted string")
        raw = self.s[self.i : end]
        self.i = end + 3
        return raw

    def _substitution(self) -> _Subst:
        self.i += 2  # ${
        optional = self._peek() == "?"
        if optional:
            self.i += 1
        end = self.s.find("}", self.i)
        if end < 0:
            raise self._err("unterminated substitution")
        path = self.s[self.i : end].strip()
        self.i = end + 1
        return _Subst(path, optional)

    # --- object merging --------------------------------------------------
    def _merge_path(self, obj: dict, path: list[str], val) -> None:
        for p in path[:-1]:
            nxt = obj.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
                obj[p] = nxt
            obj = nxt
        key = path[-1]
        if isinstance(val, dict) and isinstance(obj.get(key), dict):
            self._deep_merge(obj[key], val)
        else:
            obj[key] = val

    @staticmethod
    def _deep_merge(dst: dict, src: dict) -> None:
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                _Parser._deep_merge(dst[k], v)
            else:
                dst[k] = v


import re as _re

_Parser._NUMBER = _re.compile(
    r"[-+]?[0-9]+(?:\.[0-9]+)?(?:[eE][-+]?[0-9]+)?(?=[ \t]*(?:[\n,\]}#]|//|$))"
)


def _lookup(root, path: str):
    cur = root
    for p in path.split("."):
        if not isinstance(cur, dict) or p not in cur:
            return _MISSING
        cur = cur[p]
    return cur


_MISSING = object()


def _resolve(node, root, stack: tuple = ()):  # noqa: C901 — small dispatch
    if isinstance(node, _Subst):
        if node.path in stack:
            raise HoconError(f"substitution cycle through ${{{node.path}}}")
        v = _lookup(root, node.path)
        if v is _MISSING:
            env = os.environ.get(node.path)
            if env is not None:
                return env
            if node.optional:
                return _MISSING
            raise HoconError(f"could not resolve ${{{node.path}}}")
        return _resolve(v, root, stack + (node.path,))
    if isinstance(node, _Concat):
        out = []
        for p in node.parts:
            r = _resolve(p, root, stack)
            if r is _MISSING:
                continue
            out.append(r if isinstance(r, str) else json.dumps(r))
        return "".join(out).strip()
    if isinstance(node, dict):
        resolved = {}
        for k, v in node.items():
            r = _resolve(v, root, stack)
            if r is _MISSING:  # ${?absent} — drop the key
                continue
            resolved[k] = r
        return resolved
    if isinstance(node, list):
        return [r for r in (_resolve(v, root, stack) for v in node) if r is not _MISSING]
    return node


def loads(text: str):
    """Parse a HOCON (or JSON) document → Python dict/list."""
    try:
        import pyhocon  # full-spec parser, preferred when present

        return pyhocon.ConfigFactory.parse_string(text).as_plain_ordered_dict()
    except ImportError:
        pass
    tree = _Parser(text).parse()
    return _resolve(tree, tree)

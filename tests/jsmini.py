"""Mini JavaScript interpreter + DOM/WebSocket shim for CI-executing
viewer.html's INLINE script (VERDICT r4 item 5) — no browser or node exists
in this image.

Supports the ES subset the viewer client is written in: let/const/var
(with array-destructuring), function declarations, arrow functions
(expression and block bodies, closures over the defining scope),
assignments to identifiers/members/indices, if/else, classic for loops
with postfix ++, object/array literals, `new`, method calls, ternary /
logical / bitwise / comparison operators, and JS truthiness-returning
`||`/`&&`. Host objects (document, window, canvas 2D context, WebSocket,
JSON, Math) are dict-based shims that RECORD the calls so tests can assert
on the rendered output and the wire traffic.

This deliberately mirrors how tests/test_viewer_core.py executes
viewer_core.js, extended from the declarative subset to the statement
subset the event handlers need.
"""

from __future__ import annotations

import json
import math
import re

# ---------------------------------------------------------------------------
# tokenizer


_TOK = re.compile(r"""
    (?P<num>0[xX][0-9a-fA-F]+|\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+)
  | (?P<name>[A-Za-z_$][A-Za-z0-9_$]*)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<op>===|!==|\+\+|--|=>|<=|>=|&&|\|\||[-+*/%<>?:,;.()\[\]{}=!&|])
  | (?P<ws>\s+)
""", re.VERBOSE)


def _strip_comments(src):
    """Remove // and /* */ comments WITHOUT touching string literals (a
    blind regex corrupts any string containing '//', e.g. a ws:// URL)."""
    out, i, n = [], 0, len(src)
    while i < n:
        c = src[i]
        if c in "'\"`":
            q, j = c, i + 1
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == q:
                    j += 1
                    break
                j += 1
            out.append(src[i:j])
            i = j
        elif c == "/" and i + 1 < n and src[i + 1] == "/":
            while i < n and src[i] != "\n":
                i += 1
        elif c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def tokenize(src):
    src = _strip_comments(src)
    out, pos = [], 0
    while pos < len(src):
        m = _TOK.match(src, pos)
        if not m:
            raise SyntaxError(f"bad js char {src[pos]!r} at {pos}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        if m.lastgroup == "str":
            out.append(("str", m.group()[1:-1]))
        else:
            out.append((m.lastgroup, m.group()))
    out.append(("eof", ""))
    return out


# ---------------------------------------------------------------------------
# parser -> tuple AST


class Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text):
        t = self.next()
        if t[1] != text:
            raise SyntaxError(f"expected {text!r}, got {t}")

    # -- statements --

    def program(self):
        out = []
        while self.peek()[0] != "eof":
            out.append(self.statement())
        return ("block", out)

    def statement(self):
        kind, text = self.peek()
        if text in ("let", "const", "var"):
            self.next()
            decls = []
            while True:
                if self.peek()[1] == "[":       # array destructuring
                    self.next()
                    names = [self.next()[1]]
                    while self.peek()[1] == ",":
                        self.next()
                        names.append(self.next()[1])
                    self.expect("]")
                    pattern = ("arraypat", names)
                else:
                    pattern = ("name", self.next()[1])
                if self.peek()[1] == "=":
                    self.next()
                    init = self.expression()
                else:
                    init = ("undef",)
                decls.append((pattern, init))
                if self.peek()[1] == ",":
                    self.next()
                    continue
                break
            self.semi()
            return ("let", decls)
        if text == "function":
            self.next()
            name = self.next()[1]
            params = self.param_list()
            body = self.block()
            return ("fndecl", name, params, body)
        if text == "return":
            self.next()
            if self.peek()[1] in (";", "}"):
                self.semi()
                return ("return", None)
            e = self.expression()
            self.semi()
            return ("return", e)
        if text == "if":
            self.next()
            self.expect("(")
            c = self.expression()
            self.expect(")")
            then = self.statement()
            els = None
            if self.peek()[1] == "else":
                self.next()
                els = self.statement()
            return ("if", c, then, els)
        if text == "for":
            self.next()
            self.expect("(")
            init = None
            if self.peek()[1] != ";":
                init = self.statement()     # consumes the ';'
            else:
                self.next()
            cond = None
            if self.peek()[1] != ";":
                cond = self.expression()
            self.expect(";")
            update = None
            if self.peek()[1] != ")":
                update = self.expression()
            self.expect(")")
            body = self.statement()
            return ("for", init, cond, update, body)
        if text == "{":
            return self.block()
        if text == ";":
            self.next()
            return ("block", [])
        e = self.expression()
        self.semi()
        return ("expr", e)

    def semi(self):
        if self.peek()[1] == ";":
            self.next()

    def block(self):
        self.expect("{")
        out = []
        while self.peek()[1] != "}":
            out.append(self.statement())
        self.expect("}")
        return ("block", out)

    def param_list(self):
        self.expect("(")
        params = []
        if self.peek()[1] != ")":
            params.append(self.next()[1])
            while self.peek()[1] == ",":
                self.next()
                params.append(self.next()[1])
        self.expect(")")
        return params

    # -- expressions (assignment lowest) --

    def expression(self):
        left = self.ternary()
        if self.peek()[1] == "=" and left[0] in ("ident", "member", "index"):
            self.next()
            right = self.expression()
            return ("assign", left, right)
        return left

    def ternary(self):
        c = self.or_()
        if self.peek()[1] == "?":
            self.next()
            a = self.expression()
            self.expect(":")
            b = self.expression()
            return ("ternary", c, a, b)
        return c

    def or_(self):
        v = self.and_()
        while self.peek()[1] == "||":
            self.next()
            v = ("logic", "||", v, self.and_())
        return v

    def and_(self):
        v = self.bitor()
        while self.peek()[1] == "&&":
            self.next()
            v = ("logic", "&&", v, self.bitor())
        return v

    def bitor(self):
        v = self.bitand()
        while self.peek()[1] == "|":
            self.next()
            v = ("binop", "|", v, self.bitand())
        return v

    def bitand(self):
        v = self.cmp()
        while self.peek()[1] == "&":
            self.next()
            v = ("binop", "&", v, self.cmp())
        return v

    def cmp(self):
        v = self.add()
        while self.peek()[1] in ("===", "!==", "<", ">", "<=", ">="):
            op = self.next()[1]
            v = ("binop", op, v, self.add())
        return v

    def add(self):
        v = self.mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            v = ("binop", op, v, self.mul())
        return v

    def mul(self):
        v = self.unary()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            v = ("binop", op, v, self.unary())
        return v

    def unary(self):
        if self.peek()[1] in ("-", "!", "+"):
            op = self.next()[1]
            return ("unary", op, self.unary())
        return self.postfix()

    def postfix(self):
        v = self.primary()
        while True:
            kind, text = self.peek()
            if text == ".":
                self.next()
                v = ("member", v, self.next()[1])
            elif text == "[":
                self.next()
                idx = self.expression()
                self.expect("]")
                v = ("index", v, idx)
            elif text == "(":
                self.next()
                args = []
                if self.peek()[1] != ")":
                    args.append(self.expression())
                    while self.peek()[1] == ",":
                        self.next()
                        args.append(self.expression())
                self.expect(")")
                v = ("call", v, args)
            elif text == "++":
                self.next()
                v = ("postinc", v, 1)
            elif text == "--":
                self.next()
                v = ("postinc", v, -1)
            else:
                return v

    def _is_arrow_ahead(self):
        """At '(': does the matching ')' lead to '=>'?"""
        depth, k = 0, 0
        while True:
            t = self.peek(k)[1]
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
                if depth == 0:
                    return self.peek(k + 1)[1] == "=>"
            elif t == "" or t == ";":
                return False
            k += 1

    def primary(self):
        kind, text = self.peek()
        if text == "(" and self._is_arrow_ahead():
            params = self.param_list()
            self.expect("=>")
            if self.peek()[1] == "{":
                body = self.block()
            else:
                body = ("return", self.expression())
            return ("arrow", params, body)
        if kind == "name" and self.peek(1)[1] == "=>":
            name = self.next()[1]
            self.next()
            if self.peek()[1] == "{":
                body = self.block()
            else:
                body = ("return", self.expression())
            return ("arrow", [name], body)
        kind, text = self.next()
        if kind == "num":
            if text.lower().startswith("0x"):
                return ("num", float(int(text, 16)))
            return ("num", float(text))
        if kind == "str":
            return ("str", text)
        if text == "(":
            v = self.expression()
            self.expect(")")
            return v
        if text == "[":
            out = []
            if self.peek()[1] != "]":
                out.append(self.expression())
                while self.peek()[1] == ",":
                    self.next()
                    out.append(self.expression())
            self.expect("]")
            return ("array", out)
        if text == "{":
            pairs = []
            if self.peek()[1] != "}":
                while True:
                    key = self.next()[1]
                    self.expect(":")
                    pairs.append((key, self.expression()))
                    if self.peek()[1] == ",":
                        self.next()
                        continue
                    break
            self.expect("}")
            return ("object", pairs)
        if text == "new":
            ctor = self.next()[1]
            self.expect("(")
            args = []
            if self.peek()[1] != ")":
                args.append(self.expression())
                while self.peek()[1] == ",":
                    self.next()
                    args.append(self.expression())
            self.expect(")")
            return ("new", ctor, args)
        if text == "null":
            return ("null",)
        if text == "undefined":
            return ("undef",)
        if text == "true":
            return ("bool", True)
        if text == "false":
            return ("bool", False)
        if kind == "name":
            return ("ident", text)
        raise SyntaxError(f"unexpected token {text!r}")


# ---------------------------------------------------------------------------
# values + interpreter


class _Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEF = _Undefined()


def truthy(v):
    if v is None or v is UNDEF or v is False:
        return False
    if isinstance(v, float) and (v == 0 or math.isnan(v)):
        return False
    if v == "":
        return False
    return True


def _num_str(v):
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


class Scope:
    def __init__(self, parent=None):
        self.vars = {}
        self.parent = parent

    def declare(self, name, val):
        self.vars[name] = val

    def get(self, name):
        s = self
        while s is not None:
            if name in s.vars:
                return s.vars[name]
            s = s.parent
        raise NameError(f"undefined variable {name!r}")

    def set(self, name, val):
        s = self
        while s is not None:
            if name in s.vars:
                s.vars[name] = val
                return
            s = s.parent
        # sloppy-mode global assignment
        g = self
        while g.parent is not None:
            g = g.parent
        g.vars[name] = val


class JSFunction:
    def __init__(self, params, body, scope, vm, name="<anon>"):
        self.params, self.body, self.scope, self.vm = params, body, scope, vm
        self.name = name

    def __call__(self, *args):
        frame = Scope(self.scope)
        for i, p in enumerate(self.params):
            frame.declare(p, args[i] if i < len(args) else UNDEF)
        try:
            self.vm.exec_stmt(self.body, frame)
        except _Return as r:
            return r.value
        return UNDEF


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class VM:
    def __init__(self, global_scope=None):
        self.globals = global_scope or Scope()
        self.globals.declare("Math", {
            "min": lambda *a: min(a), "max": lambda *a: max(a),
            "abs": abs, "round": lambda x: float(math.floor(x + 0.5)),
            "floor": lambda x: float(math.floor(x)),
            "sqrt": math.sqrt, "PI": math.pi,
        })
        self.globals.declare("JSON", {
            "parse": lambda s: _to_js(json.loads(s)),
            "stringify": lambda v: json.dumps(_from_js(v)),
        })

    def run(self, src, scope=None):
        ast = Parser(tokenize(src)).program()
        self.exec_stmt(ast, scope or self.globals)

    def call(self, name, *args):
        return self.globals.get(name)(*args)

    # -- statement execution --

    def exec_stmt(self, node, scope):
        tag = node[0]
        if tag == "block":
            for s in node[1]:
                self.exec_stmt(s, scope)
        elif tag == "let":
            for pattern, init in node[1]:
                v = self.eval(init, scope)
                if pattern[0] == "name":
                    scope.declare(pattern[1], v)
                else:
                    for i, nm in enumerate(pattern[1]):
                        scope.declare(nm, v[i] if i < len(v) else UNDEF)
        elif tag == "fndecl":
            scope.declare(node[1],
                          JSFunction(node[2], node[3], scope, self, node[1]))
        elif tag == "expr":
            self.eval(node[1], scope)
        elif tag == "return":
            raise _Return(UNDEF if node[1] is None
                          else self.eval(node[1], scope))
        elif tag == "if":
            if truthy(self.eval(node[1], scope)):
                self.exec_stmt(node[2], scope)
            elif node[3] is not None:
                self.exec_stmt(node[3], scope)
        elif tag == "for":
            inner = Scope(scope)
            if node[1] is not None:
                self.exec_stmt(node[1], inner)
            guard = 0
            while node[2] is None or truthy(self.eval(node[2], inner)):
                self.exec_stmt(node[4], Scope(inner))
                if node[3] is not None:
                    self.eval(node[3], inner)
                guard += 1
                if guard > 1_000_000:
                    raise RuntimeError("for-loop runaway")
        else:
            raise AssertionError(f"unknown statement {tag}")

    # -- expression evaluation --

    def eval(self, node, scope):
        tag = node[0]
        if tag == "num" or tag == "str" or tag == "bool":
            return node[1]
        if tag == "null":
            return None
        if tag == "undef":
            return UNDEF
        if tag == "ident":
            return scope.get(node[1])
        if tag == "array":
            return [self.eval(e, scope) for e in node[1]]
        if tag == "object":
            return {k: self.eval(e, scope) for k, e in node[1]}
        if tag == "arrow":
            return JSFunction(node[1], node[2], scope, self)
        if tag == "member":
            return self.get_member(self.eval(node[1], scope), node[2])
        if tag == "index":
            obj = self.eval(node[1], scope)
            idx = self.eval(node[2], scope)
            if isinstance(obj, list):
                i = int(idx)
                return obj[i] if 0 <= i < len(obj) else UNDEF
            if isinstance(obj, dict):
                return obj.get(idx, UNDEF)
            raise TypeError(f"cannot index {obj!r}")
        if tag == "call":
            fn = self.eval(node[1], scope)
            args = [self.eval(a, scope) for a in node[2]]
            if fn is UNDEF or fn is None:
                raise TypeError(f"{node[1]} is not a function")
            return fn(*args)
        if tag == "new":
            ctor = scope.get(node[1])
            return ctor(*[self.eval(a, scope) for a in node[2]])
        if tag == "assign":
            val = self.eval(node[2], scope)
            self.assign(node[1], val, scope)
            return val
        if tag == "postinc":
            old = self.eval(node[1], scope)
            self.assign(node[1], old + node[2], scope)
            return old
        if tag == "ternary":
            return (self.eval(node[2], scope)
                    if truthy(self.eval(node[1], scope))
                    else self.eval(node[3], scope))
        if tag == "logic":
            left = self.eval(node[2], scope)
            if node[1] == "||":
                return left if truthy(left) else self.eval(node[3], scope)
            return self.eval(node[3], scope) if truthy(left) else left
        if tag == "unary":
            v = self.eval(node[2], scope)
            if node[1] == "-":
                return -v
            if node[1] == "+":
                return +v
            return not truthy(v)
        if tag == "binop":
            op = node[1]
            a = self.eval(node[2], scope)
            b = self.eval(node[3], scope)
            if op == "+":
                if isinstance(a, str) or isinstance(b, str):
                    return ((a if isinstance(a, str) else _num_str(a))
                            + (b if isinstance(b, str) else _num_str(b)))
                return a + b
            if op == "-":
                return a - b
            if op == "*":
                return a * b
            if op == "/":
                if b == 0:
                    return (math.nan if a == 0
                            else math.copysign(math.inf, a))
                return a / b
            if op == "%":
                return math.fmod(a, b)
            if op == "&":
                return float(int(a) & int(b))
            if op == "|":
                return float(int(a) | int(b))
            if op == "===":
                return self._strict_eq(a, b)
            if op == "!==":
                return not self._strict_eq(a, b)
            if op == "<":
                return a < b
            if op == ">":
                return a > b
            if op == "<=":
                return a <= b
            if op == ">=":
                return a >= b
        raise AssertionError(f"unknown expression {tag}")

    @staticmethod
    def _strict_eq(a, b):
        if isinstance(a, bool) != isinstance(b, bool):
            return False
        if isinstance(a, (float, int)) and isinstance(b, (float, int)):
            return float(a) == float(b)
        if type(a) is not type(b):
            return False
        if isinstance(a, (str, bool)):
            return a == b
        return a is b

    def assign(self, target, val, scope):
        tag = target[0]
        if tag == "ident":
            scope.set(target[1], val)
        elif tag == "member":
            obj = self.eval(target[1], scope)
            if isinstance(obj, dict):
                obj[target[2]] = val
            else:
                setattr(obj, target[2], val)
        elif tag == "index":
            obj = self.eval(target[1], scope)
            idx = int(self.eval(target[2], scope))
            obj[idx] = val
        else:
            raise AssertionError(f"bad assignment target {tag}")

    def get_member(self, obj, name):
        if isinstance(obj, dict):
            return obj.get(name, UNDEF)
        if isinstance(obj, list):
            if name == "length":
                return float(len(obj))
            if name == "push":
                return lambda *a: (obj.extend(a), float(len(obj)))[1]
            return UNDEF
        if isinstance(obj, str):
            if name == "length":
                return float(len(obj))
            if name == "toLowerCase":
                return obj.lower
            if name == "toUpperCase":
                return obj.upper
            if name == "padStart":
                return lambda n, ch=" ": obj.rjust(int(n), ch)
            return UNDEF
        if isinstance(obj, (float, int)) and not isinstance(obj, bool):
            if name == "toString":
                def _tostr(radix=10.0):
                    r = int(radix)
                    n = int(obj)
                    if r == 10:
                        return _num_str(float(obj))
                    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
                    neg, n = n < 0, abs(n)
                    out = ""
                    while True:
                        out = digits[n % r] + out
                        n //= r
                        if n == 0:
                            break
                    return ("-" if neg else "") + out
                return _tostr
            return UNDEF
        if obj is UNDEF or obj is None:
            raise TypeError(f"cannot read {name!r} of {obj!r}")
        return getattr(obj, name)


def _to_js(v):
    """json.loads output -> JS values (numbers become floats)."""
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, list):
        return [_to_js(x) for x in v]
    if isinstance(v, dict):
        return {k: _to_js(x) for k, x in v.items()}
    return v


def _from_js(v):
    """JS values -> json.dumps input (integral floats become ints)."""
    if v is UNDEF:
        return None
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, float):
        return int(v) if v.is_integer() else v
    if isinstance(v, list):
        return [_from_js(x) for x in v]
    if isinstance(v, dict):
        return {k: _from_js(x) for k, x in v.items()}
    return v


# ---------------------------------------------------------------------------
# DOM / WebSocket shim


def make_dom(width=800.0, height=600.0, bar_height=40.0):
    """Build the document/window/WebSocket shim the viewer.html inline
    script runs against. Returns (globals_dict, harness) where harness
    exposes the recorders and event dispatchers."""
    ctx_ops = []
    ctx = {}

    def _op(name):
        def rec(*args):
            ctx_ops.append((name, [_from_js(a) for a in args],
                            ctx.get("fillStyle"), ctx.get("strokeStyle")))
            return UNDEF
        return rec

    for m in ("fillRect", "strokeRect", "beginPath", "moveTo", "lineTo",
              "stroke", "arc", "fillText", "setLineDash", "clearRect"):
        ctx[m] = _op(m)

    listeners = {}          # (target_id, type) -> [fn]

    def _add_listener(tid):
        def add(typ, fn, *rest):
            listeners.setdefault((tid, typ), []).append(fn)
            return UNDEF
        return add

    canvas = {
        "width": width, "height": height, "tagName": "CANVAS",
        "getContext": lambda t: ctx,
        "addEventListener": _add_listener("cv"),
        "toDataURL": lambda typ="image/png": "data:" + typ + ";base64,TEST",
        "style": {},
    }
    url_box = {"value": "ws://test", "tagName": "INPUT"}
    status = {"textContent": "disconnected", "tagName": "SPAN"}
    bar = {"offsetHeight": bar_height, "tagName": "DIV"}
    elements = {"cv": canvas, "url": url_box, "status": status, "bar": bar}

    anchors = []

    def create_element(tag):
        el = {"tagName": tag.upper(), "download": "", "href": "",
              "clicked": False}
        el["click"] = lambda el=el: el.__setitem__("clicked", True) or UNDEF
        anchors.append(el)
        return el

    document = {
        "getElementById": lambda i: elements[i],
        "createElement": create_element,
    }
    window = {
        "innerWidth": width, "innerHeight": height,
        "addEventListener": _add_listener("window"),
    }

    sockets = []

    def websocket_ctor(url):
        ws = {"url": url, "readyState": 0.0, "sent": [],
              "onopen": UNDEF, "onclose": UNDEF, "onmessage": UNDEF}
        ws["send"] = lambda s, ws=ws: ws["sent"].append(s) or UNDEF
        sockets.append(ws)
        return ws

    class Harness:
        pass

    h = Harness()
    h.ctx_ops = ctx_ops
    h.canvas = canvas
    h.elements = elements
    h.anchors = anchors
    h.sockets = sockets
    h.listeners = listeners

    def make_event(**kw):
        ev = {"offsetX": 0.0, "offsetY": 0.0, "button": 0.0,
              "altKey": False, "ctrlKey": False, "shiftKey": False,
              "deltaY": 0.0, "key": "", "target": canvas,
              "prevented": False}
        ev["preventDefault"] = (
            lambda ev=ev: ev.__setitem__("prevented", True) or UNDEF)
        for k, v in kw.items():
            ev[k] = (float(v) if isinstance(v, (int, float))
                     and not isinstance(v, bool) else v)
        return ev

    def dispatch(_tid, _typ, **kw):
        ev = make_event(**kw)
        for fn in listeners.get((_tid, _typ), []):
            fn(ev)
        return ev

    h.make_event = make_event
    h.dispatch = dispatch

    g = {"document": document, "window": window,
         "WebSocket": websocket_ctor}
    return g, h


def load_viewer(html_path, core_path, dom_globals=None):
    """Execute viewer_core.js + viewer.html's inline <script> in one VM.
    Returns (vm, harness)."""
    g, h = dom_globals if dom_globals is not None else make_dom()
    vm = VM()
    for name, val in g.items():
        vm.globals.declare(name, val)
    with open(core_path) as f:
        vm.run(f.read())
    with open(html_path) as f:
        html = f.read()
    scripts = re.findall(r"<script>(.*?)</script>", html, flags=re.S)
    if not scripts:
        raise AssertionError("viewer.html has no inline <script> block")
    for s in scripts:
        vm.run(s)
    return vm, h

"""Bounded PostScript interpreter for Type1 font programs (FN7).

The reference interprets Type1 fonts with a PostScript machine
(`src/postscript/interpreter.rs`); our Type1 path extracts /Encoding by
a dup/put scan (kernel/type1.py), which handles table-style encodings
but not PROGRAMMATIC ones (`0 1 255 {...} for` loops, conditionals).
This module is a from-scratch mini interpreter of the public PostScript
Language Reference subset those font programs use — operand/dict
stacks, procedures, arrays, arithmetic/comparison, def/known/get/put,
if/ifelse/for — written against the PLRM semantics; the reference's 17
unit tests are ported (tests/test_postscript.py, SURVEY §5 test-parity
policy) as the behavioral oracle.

Deviations, pinned by the ported tests:
- `for` pushes the control value as a FLOAT even for integer operands
  (the reference does; real PostScript keeps ints) — parity wins.
- access modifiers (readonly/executeonly/noaccess) are accepted no-ops.
- `internaldict` answers the magic 1183615869 with an empty dict.

Safety: fuel-bounded (default 200k operations) and depth-capped — a
crafted font program terminates with PSError, never hangs; callers
treat PSError as a soft failure.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union


class PSError(Exception):
    pass


class PSName(str):
    """Literal name (/x). Executable names are looked up, never pushed."""

    __slots__ = ()


class PSProc(list):
    """Deferred procedure body ({ ... })."""

    __slots__ = ()


class PSBuiltin:
    """Marker for a builtin operator stored as a dict VALUE (so
    `systemdict /internaldict get exec` dispatches the builtin without a
    self-referential trampoline proc, which would recurse now that
    dict-stack lookup precedes the operator table)."""

    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name


class PSMark:
    __slots__ = ()


MARK = PSMark()

_SELF_DELIM = b"()<>[]{}/%"
_WS = b" \t\r\n\f\x00"


def tokenize(src: bytes) -> List[object]:
    """PostScript token stream: numbers, literal names, executable names
    (plain str), strings (nesting parens), procedure/array delimiters,
    comments. Hex strings <...> and radix numbers are out of scope for
    Type1 cleartext."""
    out: List[object] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in _WS:
            i += 1
            continue
        if c == 0x25:  # % comment to EOL
            while i < n and src[i] not in b"\r\n":
                i += 1
            continue
        if c == 0x28:  # ( string with nested parens + escapes
            depth, i = 1, i + 1
            buf = bytearray()
            while i < n and depth:
                ch = src[i]
                if ch == 0x5C and i + 1 < n:
                    buf.append(src[i + 1])
                    i += 2
                    continue
                if ch == 0x28:
                    depth += 1
                elif ch == 0x29:
                    depth -= 1
                    if depth == 0:
                        i += 1
                        break
                buf.append(ch)
                i += 1
            else:
                if depth:
                    raise PSError("unterminated string")
            out.append(bytes(buf))
            continue
        if c in b"[]{}":
            out.append(chr(c))
            i += 1
            continue
        if c == 0x2F:  # literal name
            j = i + 1
            while j < n and src[j] not in _WS and src[j] not in _SELF_DELIM:
                j += 1
            out.append(PSName(src[i + 1 : j].decode("latin-1")))
            i = j
            continue
        # number or executable name
        j = i
        while j < n and src[j] not in _WS and src[j] not in _SELF_DELIM:
            j += 1
        if j == i:
            # a self-delimiting char with no handler above (<, >): hex
            # strings are out of scope — reject rather than loop
            raise PSError(f"unsupported token byte {src[i]:#x}")
        word = src[i:j].decode("latin-1")
        i = j
        num = _parse_number(word)
        out.append(word if num is None else num)
    return out


def _parse_number(word: str) -> Optional[Union[int, float]]:
    try:
        return int(word)
    except ValueError:
        pass
    try:
        if any(ch.isdigit() for ch in word):
            return float(word)
    except ValueError:
        pass
    return None


def _is_int(x) -> bool:
    return isinstance(x, int) and not isinstance(x, bool)


def _is_num(x) -> bool:
    return _is_int(x) or isinstance(x, float)


# StandardEncoding as a systemdict constant: font programs reference it
# by name (`/Encoding StandardEncoding def`). A program that assigns it
# verbatim is declaring "no custom encoding" — the kernel's base-
# encoding rule (§9.6.6.1, kernel/fonts.py) already covers that case,
# so the constant is a 256-slot .notdef sentinel that
# encoding_from_program filters to None (= fall back).
def _standard_encoding_array() -> list:
    return [PSName(".notdef")] * 256


class Interpreter:
    """Operand stack + dict stack machine over the tokenized program."""

    MAX_FUEL = 200_000
    MAX_DEPTH = 64

    def __init__(self, src: bytes):
        self.stack: List[object] = []
        self.userdict: Dict[str, object] = {}
        self.systemdict: Dict[str, object] = {
            "StandardEncoding": _standard_encoding_array(),
            "true": True,
            "false": False,
            "internaldict": PSBuiltin("internaldict"),
        }
        self.dicts: List[Dict[str, object]] = [self.systemdict, self.userdict]
        self.fuel = self.MAX_FUEL
        self.tokens = tokenize(src)

    # ---------------------------------------------------------------- stack

    def pop(self):
        if not self.stack:
            raise PSError("stack underflow")
        return self.stack.pop()

    def push(self, obj) -> None:
        if len(self.stack) > 1_000_000:
            # `copy` doubles the stack per call: geometric growth would
            # exhaust memory long before the fuel counter fires
            raise PSError("operand stack overflow")
        self.stack.append(obj)

    def pop_num(self) -> Union[int, float]:
        v = self.pop()
        if not _is_num(v):
            raise PSError(f"expected number, got {v!r}")
        return v

    def pop_proc(self) -> PSProc:
        v = self.pop()
        if not isinstance(v, PSProc):
            raise PSError(f"expected procedure, got {v!r}")
        return v

    def _lookup(self, name: str):
        for d in reversed(self.dicts):
            if name in d:
                return d[name]
        raise PSError(f"undefined name {name!r}")

    # ------------------------------------------------------------------ run

    def run(self) -> "Interpreter":
        self._execute(self.tokens, 0)
        return self

    def _execute(self, tokens: List[object], depth: int) -> None:
        if depth > self.MAX_DEPTH:
            raise PSError("execution depth exceeded")
        i = 0
        while i < len(tokens):
            self.fuel -= 1
            if self.fuel <= 0:
                raise PSError("fuel exhausted")
            tok = tokens[i]
            i += 1
            if isinstance(tok, PSProc) or isinstance(tok, PSName) \
                    or isinstance(tok, (bytes, bool, float, list, dict)) \
                    or _is_int(tok):
                self.push(tok)
                continue
            if tok == "{":
                body, i = self._collect_proc(tokens, i)
                self.push(body)
                continue
            if tok == "[":
                self.push(MARK)
                continue
            if tok == "]":
                self._array_from_mark()
                continue
            if tok == "}":
                raise PSError("unmatched }")
            # executable name
            self._execute_name(tok, depth)

    def _collect_proc(self, tokens: List[object], i: int) -> Tuple[PSProc, int]:
        body: PSProc = PSProc()
        depth = 1
        while i < len(tokens):
            tok = tokens[i]
            i += 1
            if tok == "{":
                inner, i = self._collect_proc(tokens, i)
                body.append(inner)
                continue
            if tok == "}":
                return body, i
            body.append(tok)
        raise PSError("unterminated procedure")

    def _array_from_mark(self) -> None:
        items: List[object] = []
        while True:
            v = self.pop()
            if v is MARK:
                break
            items.append(v)
        self.push(list(reversed(items)))

    def _execute_name(self, name: str, depth: int) -> None:
        # PLRM dict-stack lookup order: a program's own definition (userdict
        # shadowing systemdict) wins over the builtin operator table — a
        # Type1 program may legally redefine /put, /def, /array etc., and
        # dispatching the builtin first would silently execute the wrong
        # code (ADVICE r3 #1). Membership walk, not try/except around
        # _lookup: builtins are the overwhelmingly common case and an
        # exception per executed token would make this the hot path's
        # slowest line.
        val = None
        for d in reversed(self.dicts):
            if name in d:
                val = d[name]
                break
        else:
            op = _OPERATORS.get(name)
            if op is None:
                raise PSError(f"undefined name {name!r}")
            op(self, depth)
            return
        if isinstance(val, PSBuiltin):
            _OPERATORS[val.name](self, depth)
        elif isinstance(val, PSProc):
            self._execute(list(val), depth + 1)
        else:
            self.push(val)

    # ------------------------------------------------------------ operators

    def _arith(self, fn, depth) -> None:
        b, a = self.pop_num(), self.pop_num()
        try:
            r = fn(a, b)
        except ZeroDivisionError:
            raise PSError("division by zero")
        if _is_int(a) and _is_int(b) and fn is not _TRUEDIV:
            # 32-bit integer semantics (reference parity: i32 checked
            # ops overflow to float) — ALSO the guard against crafted
            # `dup mul` bignum growth, which would exhaust memory long
            # before the fuel counter fires
            r = int(r)
            if -(2 ** 31) <= r < 2 ** 31:
                self.push(r)
            else:
                self.push(float(r))
        else:
            self.push(float(r))

    def _cmp(self, fn, depth) -> None:
        b, a = self.pop(), self.pop()
        if _is_num(a) and _is_num(b):
            self.push(bool(fn(a, b)))
        elif isinstance(a, bytes) and isinstance(b, bytes):
            self.push(bool(fn(a, b)))
        else:
            raise PSError("bad comparison operands")


def _TRUEDIV(a, b):
    return a / b


def _op_def(ip: Interpreter, depth) -> None:
    val = ip.pop()
    key = ip.pop()
    if not isinstance(key, PSName):
        raise PSError("def key must be a name")
    ip.dicts[-1][str(key)] = val


def _op_dict(ip: Interpreter, depth) -> None:
    ip.pop_num()  # capacity hint
    ip.push({})


def _op_begin(ip: Interpreter, depth) -> None:
    d = ip.pop()
    if not isinstance(d, dict):
        raise PSError("begin expects a dict")
    if len(ip.dicts) > Interpreter.MAX_DEPTH:
        raise PSError("dict stack overflow")
    ip.dicts.append(d)


def _op_end(ip: Interpreter, depth) -> None:
    if len(ip.dicts) <= 2:
        raise PSError("dict stack underflow")
    ip.dicts.pop()


def _op_currentdict(ip: Interpreter, depth) -> None:
    ip.push(ip.dicts[-1])


def _op_known(ip: Interpreter, depth) -> None:
    key = ip.pop()
    d = ip.pop()
    if not isinstance(d, dict) or not isinstance(key, PSName):
        raise PSError("known expects dict + name")
    ip.push(str(key) in d)


def _int_index(key) -> int:
    """Array indices: ints, or integral floats (the for-loop control is
    a float by reference parity, and Type1 boilerplate feeds it
    straight into put)."""
    if _is_int(key):
        return key
    if isinstance(key, float) and key.is_integer():
        return int(key)
    raise PSError("index must be an integer")


def _op_put(ip: Interpreter, depth) -> None:
    val = ip.pop()
    key = ip.pop()
    target = ip.pop()
    if isinstance(target, dict):
        if not isinstance(key, PSName):
            raise PSError("dict put key must be a name")
        target[str(key)] = val
    elif isinstance(target, list):
        idx = _int_index(key)
        if not (0 <= idx < len(target)):
            raise PSError("array put out of range")
        target[idx] = val
    else:
        raise PSError("put target must be dict or array")


def _op_get(ip: Interpreter, depth) -> None:
    key = ip.pop()
    target = ip.pop()
    if isinstance(target, dict):
        if not isinstance(key, PSName) or str(key) not in target:
            raise PSError("get: missing key")
        ip.push(target[str(key)])
    elif isinstance(target, list):
        idx = _int_index(key)
        if not (0 <= idx < len(target)):
            raise PSError("get: bad index")
        ip.push(target[idx])
    else:
        raise PSError("get target must be dict or array")


def _op_copy(ip: Interpreter, depth) -> None:
    n = ip.pop()
    if not _is_int(n) or n < 0:
        raise PSError("copy expects a non-negative int")
    if n > len(ip.stack):
        raise PSError("copy underflow")
    if len(ip.stack) + n > 1_000_000:
        raise PSError("operand stack overflow")  # extend bypasses push()
    if n:
        ip.stack.extend(ip.stack[-n:])


def _op_for(ip: Interpreter, depth) -> None:
    proc = ip.pop_proc()
    limit = float(ip.pop_num())
    inc = float(ip.pop_num())
    control = float(ip.pop_num())
    if inc == 0.0:
        raise PSError("for: zero increment")
    while (control <= limit) if inc > 0 else (control >= limit):
        # reference parity: the control value is pushed as a float even
        # for all-integer operands (real PostScript would keep ints)
        ip.push(control)
        ip._execute(list(proc), depth + 1)
        control += inc
        ip.fuel -= 1
        if ip.fuel <= 0:
            raise PSError("fuel exhausted")


def _op_if(ip: Interpreter, depth) -> None:
    proc = ip.pop_proc()
    cond = ip.pop()
    if not isinstance(cond, bool):
        raise PSError("if expects a bool")
    if cond:
        ip._execute(list(proc), depth + 1)


def _op_ifelse(ip: Interpreter, depth) -> None:
    proc2 = ip.pop_proc()
    proc1 = ip.pop_proc()
    cond = ip.pop()
    if not isinstance(cond, bool):
        raise PSError("ifelse expects a bool")
    ip._execute(list(proc1 if cond else proc2), depth + 1)


def _op_exec(ip: Interpreter, depth) -> None:
    v = ip.pop()
    if isinstance(v, PSBuiltin):
        _OPERATORS[v.name](ip, depth)
    elif isinstance(v, PSProc):
        ip._execute(list(v), depth + 1)
    else:
        ip.push(v)  # non-procedures execute to themselves


def _op_internaldict(ip: Interpreter, depth) -> None:
    n = ip.pop()
    if n != 1183615869:
        raise PSError("internaldict: bad magic")
    ip.push({})


def _op_not(ip: Interpreter, depth) -> None:
    v = ip.pop()
    if isinstance(v, bool):
        ip.push(not v)
    elif _is_int(v):
        ip.push(~v)
    else:
        raise PSError("not expects bool or int")


def _op_bool(fn):
    def op(ip: Interpreter, depth) -> None:
        b, a = ip.pop(), ip.pop()
        if isinstance(a, bool) and isinstance(b, bool):
            ip.push(bool(fn(a, b)))
        elif _is_int(a) and _is_int(b):
            ip.push(int(fn(a, b)))
        else:
            raise PSError("bad logical operands")
    return op


_MAX_COMPOSITE = 65536  # fuzz-found: unbounded `N array`/`N string`
# allocations stall a task before the fuel check can fire


def _op_array(ip: Interpreter, depth) -> None:
    n = ip.pop()
    if not _is_int(n) or not (0 <= n <= _MAX_COMPOSITE):
        raise PSError("array size out of range")
    ip.push([None] * n)


def _op_string(ip: Interpreter, depth) -> None:
    n = ip.pop()
    if not _is_int(n) or not (0 <= n <= _MAX_COMPOSITE):
        raise PSError("string size out of range")
    ip.push(bytes(n))


def _op_length(ip: Interpreter, depth) -> None:
    v = ip.pop()
    if isinstance(v, (list, dict, bytes, PSProc)):
        ip.push(len(v))
    else:
        raise PSError("length expects a composite")


def _op_index(ip: Interpreter, depth) -> None:
    n = ip.pop()
    if not _is_int(n) or n < 0 or n >= len(ip.stack):
        raise PSError("index out of range")
    ip.push(ip.stack[-1 - n])


_OPERATORS = {
    "def": _op_def,
    "dict": _op_dict,
    "begin": _op_begin,
    "end": _op_end,
    "currentdict": _op_currentdict,
    "known": _op_known,
    "put": _op_put,
    "get": _op_get,
    "copy": _op_copy,
    "for": _op_for,
    "if": _op_if,
    "ifelse": _op_ifelse,
    "exec": _op_exec,
    "internaldict": _op_internaldict,
    "array": _op_array,
    "string": _op_string,
    "length": _op_length,
    "index": _op_index,
    "not": _op_not,
    "and": _op_bool(lambda a, b: a & b if not isinstance(a, bool) else (a and b)),
    "or": _op_bool(lambda a, b: a | b if not isinstance(a, bool) else (a or b)),
    "mark": lambda ip, d: ip.push(MARK),
    "count": lambda ip, d: ip.push(len(ip.stack)),
    "add": lambda ip, d: ip._arith(lambda a, b: a + b, d),
    "sub": lambda ip, d: ip._arith(lambda a, b: a - b, d),
    "mul": lambda ip, d: ip._arith(lambda a, b: a * b, d),
    "div": lambda ip, d: ip._arith(_TRUEDIV, d),
    "eq": lambda ip, d: ip.push(ip.pop() == ip.pop()),
    "ne": lambda ip, d: ip.push(ip.pop() != ip.pop()),
    "gt": lambda ip, d: ip._cmp(lambda a, b: a > b, d),
    "ge": lambda ip, d: ip._cmp(lambda a, b: a >= b, d),
    "lt": lambda ip, d: ip._cmp(lambda a, b: a < b, d),
    "le": lambda ip, d: ip._cmp(lambda a, b: a <= b, d),
    "neg": lambda ip, d: ip.push(-ip.pop_num()),
    "abs": lambda ip, d: ip.push(abs(ip.pop_num())),
    "readonly": lambda ip, d: None,
    "executeonly": lambda ip, d: None,
    "noaccess": lambda ip, d: None,
    "bind": lambda ip, d: None,  # procedures stay late-bound
    "systemdict": lambda ip, d: ip.push(ip.systemdict),
    "userdict": lambda ip, d: ip.push(ip.userdict),
    # benign Type1 file machinery: enough to not abort on the standard
    # boilerplate around the cleartext section
    "currentfile": lambda ip, d: ip.push(MARK),
    "closefile": lambda ip, d: None,
    "cleartomark": lambda ip, d: None,
}


def _op_idiv(ip: Interpreter, depth) -> None:
    b, a = ip.pop_num(), ip.pop_num()
    if float(b) == 0.0:
        raise PSError("idiv by zero")
    if _is_int(a) and _is_int(b):
        q = abs(a) // abs(b)  # exact truncation toward zero
        ip.push(-q if (a < 0) != (b < 0) else q)
    else:
        ip.push(int(a / b))


def _op_exch(ip: Interpreter, depth) -> None:
    b, a = ip.pop(), ip.pop()
    ip.push(b)
    ip.push(a)


def _op_dup(ip: Interpreter, depth) -> None:
    v = ip.pop()
    ip.push(v)
    ip.push(v)


def _op_pop(ip: Interpreter, depth) -> None:
    ip.pop()


_OPERATORS["idiv"] = _op_idiv
_OPERATORS["exch"] = _op_exch
_OPERATORS["dup"] = _op_dup
_OPERATORS["pop"] = _op_pop


def interpret(src: bytes) -> Interpreter:
    """Run a program, returning the finished interpreter (raises PSError
    on any malformed/unsupported construct — callers soft-fail)."""
    return Interpreter(src).run()


def encoding_from_program(src: bytes) -> Optional[Dict[int, str]]:
    """Interpreter-driven /Encoding extraction for PROGRAMMATIC Type1
    encodings the dup/put scan cannot see (loops, conditionals): run
    the cleartext portion and read the font dict's /Encoding array.
    Returns {code: glyph_name} or None (soft failure / no encoding)."""
    try:
        ip = Interpreter(src)  # tokenize may itself reject the bytes
    except (PSError, RecursionError):
        return None
    try:
        ip.run()
    except (PSError, RecursionError):
        pass  # salvage whatever was built before the failure
    except Exception:
        return None
    candidates: List[object] = []
    # the finished font dict may sit on the DICT stack (program stopped
    # before `end`), on the OPERAND stack (`currentdict end` idiom), or
    # be def'd into an enclosing dict
    # bounded worklist walk (ADVICE r3 #2): a one-level snapshot scan
    # missed font dicts nested more than two dict levels down (e.g.
    # FontDirectory → holder → font); pop-until-empty with the 64-dict
    # cap and an id() visited set finds them at any depth, cycle-safe
    worklist = list(ip.dicts) + [v for v in ip.stack if isinstance(v, dict)]
    seen_ids = set()
    walked = 0
    while worklist and walked < 64:
        d = worklist.pop(0)
        if id(d) in seen_ids:
            continue
        seen_ids.add(id(d))
        walked += 1
        if "Encoding" in d:
            candidates.append(d["Encoding"])
        for v in d.values():
            if isinstance(v, dict):
                worklist.append(v)
    for enc in reversed(candidates):
        if isinstance(enc, list):
            out = {
                i: str(nm)
                for i, nm in enumerate(enc[:256])
                if isinstance(nm, PSName) or isinstance(nm, str)
            }
            out = {i: n for i, n in out.items() if n != ".notdef"}
            if out:
                return out
    return None

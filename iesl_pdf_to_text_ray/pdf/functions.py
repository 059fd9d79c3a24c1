"""PDF function engine (ISO 32000 §7.10) — behavioral port of the
reference's PDFFunction (pdf.combined.js:39410-39920) and the
PostScript-calculator machinery (PostScriptLexer/Parser :31557,
PostScriptEvaluator :39921).

Supports FunctionType 0 (sampled, multilinear interpolation), 2
(exponential), 3 (stitching), 4 (PostScript calculator — the evaluator
path; the reference's JS-codegen compiler is an optimization with
identical semantics).  Used for Separation / DeviceN tint transforms in
image materialization (pdf/images.py); cross-validated against the
reference through node (tests/test_functions.py).

A parsed function is ``callable(list[float]) -> list[float]``.
"""

from __future__ import annotations

import math

from .objects import Name, PdfError, Stream


def _to_pairs(arr):
    return [(arr[i], arr[i + 1]) for i in range(0, len(arr), 2)]


def _interp(x, xmin, xmax, ymin, ymax):
    return ymin + (x - xmin) * ((ymax - ymin) / (xmax - xmin))


# ------------------------------------------------------------- sampled

def _sample_array(size, output_size, bps, data: bytes):
    """reference getSampleArray (:39417): bit-packed big-endian samples
    scaled to [0, 1]."""
    length = output_size
    for s in size:
        length *= s
    mul = 1.0 / (2.0 ** bps - 1)
    out = [0.0] * length
    code_size = 0
    code_buf = 0
    idx = 0
    for i in range(length):
        while code_size < bps:
            code_buf = (code_buf << 8) | (data[idx] if idx < len(data)
                                          else 0)
            idx += 1
            code_size += 8
        code_size -= bps
        out[i] = (code_buf >> code_size) * mul
        code_buf &= (1 << code_size) - 1
    return out


def _construct_sampled(stream: Stream, d: dict, fetch, decode_stream):
    domain = _to_pairs([float(fetch(v)) for v in fetch(d.get("Domain"))])
    range_ = _to_pairs([float(fetch(v)) for v in fetch(d.get("Range"))])
    size = [int(fetch(v)) for v in fetch(d.get("Size"))]
    bps = int(fetch(d.get("BitsPerSample")))
    enc = fetch(d.get("Encode"))
    encode = (_to_pairs([float(fetch(v)) for v in enc]) if enc
              else [(0, s - 1) for s in size])
    dec = fetch(d.get("Decode"))
    decode = (_to_pairs([float(fetch(v)) for v in dec]) if dec
              else range_)
    samples = _sample_array(size, len(range_), bps,
                            decode_stream(stream, None))
    m = len(domain)
    n = len(range_)

    def fn(src):
        # multilinear interpolation over the 2^m cube (reference
        # constructSampledFromIR :39565)
        cube_vertices = 1 << m
        cube_n = [1.0] * cube_vertices
        cube_vertex = [0] * cube_vertices
        k = n
        pos = 1
        for i in range(m):
            lo, hi = domain[i]
            xi = min(max(src[i], lo), hi)
            e = _interp(xi, lo, hi, encode[i][0], encode[i][1])
            size_i = size[i]
            e = min(max(e, 0), size_i - 1)
            e0 = math.floor(e) if e < size_i - 1 else e - 1
            n0 = e0 + 1 - e
            n1 = e - e0
            off0 = e0 * k
            off1 = off0 + k
            for j in range(cube_vertices):
                if j & pos:
                    cube_n[j] *= n1
                    cube_vertex[j] += off1
                else:
                    cube_n[j] *= n0
                    cube_vertex[j] += off0
            k *= size_i
            pos <<= 1
        out = [0.0] * n
        for j in range(n):
            rj = 0.0
            for i in range(cube_vertices):
                rj += samples[int(cube_vertex[i]) + j] * cube_n[i]
            rj = _interp(rj, 0, 1, decode[j][0], decode[j][1])
            out[j] = min(max(rj, range_[j][0]), range_[j][1])
        return out

    return fn


# --------------------------------------------------------- exponential

def _construct_interpolated(d: dict, fetch):
    c0 = [float(fetch(v)) for v in (fetch(d.get("C0")) or [0])]
    c1 = [float(fetch(v)) for v in (fetch(d.get("C1")) or [1])]
    n = float(fetch(d.get("N")))
    diff = [b - a for a, b in zip(c0, c1)]

    def fn(src):
        x = src[0] if n == 1 else src[0] ** n
        return [c + x * df for c, df in zip(c0, diff)]

    return fn


# ----------------------------------------------------------- stitching

def _construct_stitched(d: dict, fetch, parse):
    domain = [float(fetch(v)) for v in fetch(d.get("Domain"))]
    if len(domain) != 2:
        raise PdfError("PDF function: bad domain for stitched function")
    fns = [parse(fetch(f)) for f in fetch(d.get("Functions"))]
    bounds = [float(fetch(v)) for v in fetch(d.get("Bounds"))]
    encode = [float(fetch(v)) for v in fetch(d.get("Encode"))]

    def fn(src):
        v = min(max(src[0], domain[0]), domain[1])
        i = 0
        while i < len(bounds) and v >= bounds[i]:
            i += 1
        dmin = bounds[i - 1] if i > 0 else domain[0]
        dmax = bounds[i] if i < len(bounds) else domain[1]
        rmin = encode[2 * i]
        rmax = encode[2 * i + 1]
        v2 = rmin if dmin == dmax else \
            rmin + (v - dmin) * (rmax - rmin) / (dmax - dmin)
        return fns[i]([v2])

    return fn


# -------------------------------------------- PostScript calculator (4)

def tokenize_ps(data: bytes) -> list:
    """reference PostScriptLexer (:31672): numbers, braces, operators
    (if/ifelse special-cased), % comments."""
    tokens = []
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x25:                     # comment
            while i < n and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        if c in (0x09, 0x0A, 0x0D, 0x20):   # the reference Lexer.isSpace set
            i += 1
            continue
        if c in (0x7B, 0x7D):
            tokens.append(chr(c))
            i += 1
            continue
        if 0x30 <= c <= 0x39 or c in (0x2B, 0x2D, 0x2E):
            j = i + 1
            while j < n and (0x30 <= data[j] <= 0x39 or
                             data[j] in (0x2D, 0x2E)):
                j += 1
            try:
                tokens.append(float(data[i:j]))
            except ValueError:
                raise PdfError("PS function: invalid number")
            i = j
            continue
        j = i + 1
        while j < n and (0x41 <= data[j] <= 0x5A or
                         0x61 <= data[j] <= 0x7A):
            j += 1
        word = data[i:j].decode("latin1")
        lw = word.lower()
        tokens.append("IF" if lw == "if" else
                      "IFELSE" if lw == "ifelse" else word)
        i = j
    return tokens


def parse_ps(tokens: list) -> list:
    """reference PostScriptParser (:31557): flatten to an operator list
    with jz/j jumps for if/ifelse."""
    operators: list = []
    pos = 0

    def accept(val):
        nonlocal pos
        if pos < len(tokens) and tokens[pos] == val:
            pos += 1
            return True
        return False

    def accept_number():
        nonlocal pos
        if pos < len(tokens) and isinstance(tokens[pos], float):
            pos += 1
            return True
        return False

    def expect(val):
        if not accept(val):
            raise PdfError("PS function: unexpected symbol")

    def parse_block():
        nonlocal pos
        while True:
            if accept_number():
                operators.append(tokens[pos - 1])
            elif pos < len(tokens) and isinstance(tokens[pos], str) and \
                    tokens[pos] not in ("{", "}", "IF", "IFELSE"):
                operators.append(tokens[pos])
                pos += 1
            elif accept("{"):
                parse_condition()
            else:
                return

    def parse_condition():
        cond = len(operators)
        operators.extend([None, None])
        parse_block()
        expect("}")
        if accept("IF"):
            operators[cond] = len(operators)
            operators[cond + 1] = "jz"
        elif accept("{"):
            jump = len(operators)
            operators.extend([None, None])
            end_of_true = len(operators)
            parse_block()
            expect("}")
            expect("IFELSE")
            operators[jump] = len(operators)
            operators[jump + 1] = "j"
            operators[cond] = end_of_true
            operators[cond + 1] = "jz"
        else:
            raise PdfError("PS function: error parsing conditional")

    expect("{")
    parse_block()
    expect("}")
    return operators


_MAX_STACK = 100


def execute_ps(operators: list, initial: list) -> list:
    """reference PostScriptEvaluator.execute (:39926).  Booleans follow
    the JS type-split semantics (logical for bools, bitwise for
    numbers); bitwise ops run on int32."""
    stack = list(initial)

    def push(v):
        if len(stack) >= _MAX_STACK:
            raise PdfError("PS function: stack overflow")
        stack.append(v)

    def pop():
        if not stack:
            raise PdfError("PS function: stack underflow")
        return stack.pop()

    def roll(nn, p):
        l = len(stack) - nn                              # noqa: E741
        r = len(stack) - 1
        c = int(l + (p - math.floor(p / nn) * nn))
        stack[l:r + 1] = stack[l:r + 1][::-1]
        stack[l:c] = stack[l:c][::-1]
        stack[c:r + 1] = stack[c:r + 1][::-1]

    def i32(v):
        v = int(v) & 0xFFFFFFFF
        return v - (1 << 32) if v >= (1 << 31) else v

    counter = 0
    while counter < len(operators):
        op = operators[counter]
        counter += 1
        if isinstance(op, (int, float)) and not isinstance(op, bool):
            # numbers — including the jump targets parse_ps planted
            # before jz/j, which travel via the stack like any operand
            push(op)
            continue
        if op == "jz":
            b = pop()
            a = pop()
            if not a:
                counter = int(b)
        elif op == "j":
            counter = int(pop())
        elif op == "abs":
            push(abs(pop()))
        elif op == "add":
            b = pop()
            a = pop()
            push(a + b)
        elif op == "and":
            b = pop()
            a = pop()
            if isinstance(a, bool) and isinstance(b, bool):
                push(a and b)
            else:
                push(i32(a) & i32(b))
        elif op == "atan":
            push(math.atan(pop()))
        elif op == "bitshift":
            b = pop()
            a = pop()
            if a > 0:
                push(i32(i32(a) << (int(b) & 31)))
            else:
                push(i32(a) >> (int(b) & 31))
        elif op == "ceiling":
            push(float(math.ceil(pop())))
        elif op == "copy":
            nn = int(pop())
            if len(stack) + nn >= _MAX_STACK:
                raise PdfError("PS function: stack overflow")
            if nn > 0:
                stack.extend(stack[len(stack) - nn:])
        elif op == "cos":
            push(math.cos(pop()))
        elif op == "cvi":
            push(float(i32(pop())))
        elif op == "cvr":
            pass
        elif op == "div":
            b = pop()
            a = pop()
            push(a / b)
        elif op == "dup":
            a = pop()
            push(a)
            push(a)
        elif op == "eq":
            b = pop()
            a = pop()
            push(a == b)
        elif op == "exch":
            roll(2, 1)
        elif op == "exp":
            b = pop()
            a = pop()
            push(a ** b)
        elif op == "false":
            push(False)
        elif op == "floor":
            push(float(math.floor(pop())))
        elif op == "ge":
            b = pop()
            a = pop()
            push(a >= b)
        elif op == "gt":
            b = pop()
            a = pop()
            push(a > b)
        elif op == "idiv":
            b = pop()
            a = pop()
            push(float(i32(a / b)))
        elif op == "index":
            nn = int(pop())
            push(stack[len(stack) - nn - 1])
        elif op == "le":
            b = pop()
            a = pop()
            push(a <= b)
        elif op == "ln":
            push(math.log(pop()))
        elif op == "log":
            push(math.log10(pop()))
        elif op == "lt":
            b = pop()
            a = pop()
            push(a < b)
        elif op == "mod":
            b = pop()
            a = pop()
            push(math.fmod(a, b))
        elif op == "mul":
            b = pop()
            a = pop()
            push(a * b)
        elif op == "ne":
            b = pop()
            a = pop()
            push(a != b)
        elif op == "neg":
            push(-pop())
        elif op == "not":
            a = pop()
            if isinstance(a, bool):
                push(not a)
            else:
                push(float(~i32(a)))
        elif op == "or":
            b = pop()
            a = pop()
            if isinstance(a, bool) and isinstance(b, bool):
                push(a or b)
            else:
                push(i32(a) | i32(b))
        elif op == "pop":
            pop()
        elif op == "roll":
            p = pop()
            nn = pop()
            roll(int(nn), p)
        elif op == "round":
            # JS Math.round: half toward +inf
            push(float(math.floor(pop() + 0.5)))
        elif op == "sin":
            push(math.sin(pop()))
        elif op == "sqrt":
            push(math.sqrt(pop()))
        elif op == "sub":
            b = pop()
            a = pop()
            push(a - b)
        elif op == "true":
            push(True)
        elif op == "truncate":
            a = pop()
            push(float(math.ceil(a) if a < 0 else math.floor(a)))
        elif op == "xor":
            b = pop()
            a = pop()
            if isinstance(a, bool) and isinstance(b, bool):
                push(a != b)
            else:
                push(i32(a) ^ i32(b))
        else:
            raise PdfError("PS function: unknown operator %r" % op)
    return stack


def _construct_postscript(stream: Stream, d: dict, fetch, decode_stream):
    domain = [float(fetch(v)) for v in fetch(d.get("Domain"))]
    range_ = [float(fetch(v)) for v in fetch(d.get("Range"))]
    code = parse_ps(tokenize_ps(decode_stream(stream, None)))
    n_out = len(range_) >> 1

    def fn(src):
        stack = execute_ps(code, src)
        out = []
        base = len(stack) - n_out
        for i in range(n_out):
            v = stack[base + i]
            v = float(v) if not isinstance(v, bool) else float(v)
            lo = range_[2 * i]
            hi = range_[2 * i + 1]
            out.append(lo if v < lo else hi if v > hi else v)
        return out

    return fn


# --------------------------------------------------------------- entry

def parse_function(obj, fetch, decode_stream):
    """obj: function dict or stream (already fetched).  Returns
    ``callable(list[float]) -> list[float]``."""
    if isinstance(obj, Stream):
        d = obj.dict
        stream = obj
    elif isinstance(obj, dict):
        d = obj
        stream = None
    else:
        raise PdfError("PDF function: not a function object")
    d = {k: v for k, v in d.items()}
    t = int(fetch(d.get("FunctionType")))

    def parse(sub):
        return parse_function(sub, fetch, decode_stream)

    if t == 0:
        if stream is None:
            raise PdfError("PDF function: sampled function needs a stream")
        return _construct_sampled(stream, d, fetch, decode_stream)
    if t == 2:
        return _construct_interpolated(d, fetch)
    if t == 3:
        return _construct_stitched(d, fetch, parse)
    if t == 4:
        if stream is None:
            raise PdfError("PDF function: PS function needs a stream")
        return _construct_postscript(stream, d, fetch, decode_stream)
    raise PdfError("PDF function: unknown type %d" % t)


def parse_function_array(obj, fetch, decode_stream):
    """Array of 1-output functions -> one multi-output callable
    (reference parseArray :39492)."""
    if isinstance(obj, list):
        fns = [parse_function(fetch(f), fetch, decode_stream) for f in obj]

        def fn(src):
            out = []
            for f in fns:
                out.extend(f(src))
            return out

        return fn
    return parse_function(obj, fetch, decode_stream)

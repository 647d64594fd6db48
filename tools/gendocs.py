"""Generated API reference — `make docs` → docs/api/*.md.

The reference ships a Doxygen pipeline (reference: Doxyfile:1,
docs/layout.xml, Dockerfile doxygen stage) producing a browsable API
reference; this image has no doxygen/sphinx/pdoc, so this is a
dependency-free twin: runtime introspection for the Python package
(signatures + docstrings straight from the live objects, so the docs
cannot drift from the code) and a comment-preserving declaration scan
for the C ABI (csrc/capi.cpp) and the C++ consumer header
(csrc/tensor_stream.h). Markdown output renders on any forge and diffs
cleanly in review.

    make docs          # writes docs/api/
    python tools/gendocs.py [outdir]
"""
import importlib
import inspect
import os
import pkgutil
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PACKAGE = "tensor_stream_tpu"


# --------------------------------------------------------------- python

def _public_members(mod):
    """(classes, functions) defined in `mod` (not re-exports), public."""
    classes, functions = [], []
    for name in sorted(vars(mod)):
        if name.startswith("_"):
            continue
        obj = vars(mod)[name]
        if getattr(obj, "__module__", None) != mod.__name__:
            continue
        if inspect.isclass(obj):
            classes.append((name, obj))
        elif inspect.isfunction(obj):
            functions.append((name, obj))
    return classes, functions


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj, indent=""):
    doc = inspect.getdoc(obj)
    if not doc:
        return ""
    return "\n".join(indent + line for line in doc.splitlines())


def _render_class(name, cls):
    out = [f"### class `{name}{_sig(cls)}`\n"]
    doc = _doc(cls)
    if doc:
        out.append(doc + "\n")
    for mname in sorted(vars(cls)):
        if mname.startswith("_") and mname not in ("__call__",):
            continue
        m = vars(cls)[mname]
        if isinstance(m, property):
            out.append(f"- **{mname}** (property)")
            d = inspect.getdoc(m)
            if d:
                out.append(f"  — {d.splitlines()[0]}")
        elif inspect.isfunction(m):
            out.append(f"- **{mname}**`{_sig(m)}`")
            d = inspect.getdoc(m)
            if d:
                out.append(f"  — {d.splitlines()[0]}")
    out.append("")
    return "\n".join(out)


def _render_module(mod):
    out = [f"# `{mod.__name__}`\n"]
    doc = _doc(mod)
    if doc:
        out.append(doc + "\n")
    classes, functions = _public_members(mod)
    for name, fn in functions:
        out.append(f"### `{name}{_sig(fn)}`\n")
        d = _doc(fn)
        if d:
            out.append(d + "\n")
    for name, cls in classes:
        out.append(_render_class(name, cls))
    return "\n".join(out)


def gen_python(outdir):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    pkg = importlib.import_module(PACKAGE)
    pages = []
    mods = [PACKAGE]
    for m in pkgutil.walk_packages(pkg.__path__, prefix=PACKAGE + "."):
        if "._" in m.name or m.name.endswith("._native"):
            continue
        mods.append(m.name)
    for name in sorted(set(mods)):
        try:
            mod = importlib.import_module(name)
        except Exception as e:  # optional deps stay optional
            print(f"  skip {name}: {type(e).__name__}: {e}")
            continue
        md = _render_module(mod)
        fname = name.replace(".", "_") + ".md"
        with open(os.path.join(outdir, fname), "w") as f:
            f.write(md + "\n")
        pages.append((name, fname))
    return pages


# -------------------------------------------------------------- C / C++

_C_FN = re.compile(
    r"^(?P<ret>[A-Za-z_][\w \t*]*?)[ \t]+(?P<name>ts_\w+)\s*"
    r"\((?P<args>[^)]*)\)", re.M | re.S)


def gen_c_abi(outdir):
    """C ABI page: every extern-C ts_* entry point of csrc/capi.cpp with
    the comment block above it (section markers become headings)."""
    src = open(os.path.join(REPO, "csrc", "capi.cpp")).read()
    lines = src.splitlines()
    out = ["# C ABI (`libtsingest.so`)\n",
           "Every symbol below is exported with C linkage and bound by "
           "`tensor_stream_tpu._native` (ctypes, GIL released per "
           "call). Consumers outside Python load the same library via "
           "`find_package(tsingest)` (cmake/tsingestConfig.cmake.in) or "
           "the header `csrc/tensor_stream.h` for the C++ class API.\n"]
    i = 0
    while i < len(lines):
        line = lines[i]
        sec = re.match(r"//\s*-{4,}\s*(.+)$", line.strip())
        if sec:
            out.append(f"\n## {sec.group(1).strip()}\n")
            i += 1
            continue
        m = re.match(r"^[A-Za-z_][\w *]*[ *]ts_\w+\s*\(", line)
        if m:
            # signature may span lines; cut at '{' or ';'
            sig_lines = []
            j = i
            while j < len(lines):
                sig_lines.append(lines[j])
                if "{" in lines[j] or ";" in lines[j]:
                    break
                j += 1
            sig = " ".join(s.strip() for s in sig_lines)
            sig = re.sub(r"\s*\{.*$", "", sig).rstrip("; ")
            sig = re.sub(r"\s+", " ", sig)
            # comment block immediately above
            doc = []
            k = i - 1
            while k >= 0 and lines[k].strip().startswith("//") \
                    and not re.match(r"//\s*-{4,}", lines[k].strip()):
                doc.insert(0, lines[k].strip().lstrip("/").strip())
                k -= 1
            out.append(f"### `{sig}`\n")
            if doc:
                out.append(" ".join(doc) + "\n")
            i = j + 1
            continue
        i += 1
    path = os.path.join(outdir, "c_abi.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    return path


def gen_cpp_header(outdir):
    """C++ consumer page: public surface of csrc/tensor_stream.h (the
    reference's WrapperC.h counterpart) — structs and TensorStream
    methods with their comments."""
    src = open(os.path.join(REPO, "csrc", "tensor_stream.h")).read()
    out = ["# C++ consumer API (`csrc/tensor_stream.h`)\n"]
    head = []
    for line in src.splitlines():
        if line.startswith("//"):
            head.append(line.lstrip("/ ").rstrip())
        else:
            break
    out.append(" ".join(head) + "\n")
    for m in re.finditer(r"^struct (\w+) \{(.*?)^\};", src, re.M | re.S):
        out.append(f"## struct `{m.group(1)}`\n")
        out.append("```cpp\nstruct " + m.group(1) + " {"
                   + m.group(2).rstrip() + "\n};\n```\n")
    cls = re.search(r"class TensorStream \{.*", src, re.S)
    if cls:
        out.append("## class `TensorStream`\n")
        body = cls.group(0)
        for m in re.finditer(
                r"((?:^\s*//[^\n]*\n)*)^\s*(?:template <[^>]+>\s*)?"
                r"([A-Za-z_][\w:<>]*[& ]+\w+\([^;{]*\))", body, re.M):
            doc = " ".join(x.strip().lstrip("/ ")
                           for x in m.group(1).strip().splitlines())
            sig = re.sub(r"\s+", " ", m.group(2).strip())
            out.append(f"### `{sig}`\n")
            if doc:
                out.append(doc + "\n")
    path = os.path.join(outdir, "cpp.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    return path


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "docs", "api")
    os.makedirs(outdir, exist_ok=True)
    pages = gen_python(outdir)
    gen_c_abi(outdir)
    gen_cpp_header(outdir)
    with open(os.path.join(outdir, "index.md"), "w") as f:
        f.write("# tensor-stream-tpu API reference\n\n")
        f.write("Generated by `make docs` (tools/gendocs.py) from the "
                "live package — do not edit by hand. Hand-written "
                "guides live one directory up (docs/API.md, DESIGN.md, "
                "MIGRATION.md, PARITY.md).\n\n")
        f.write("## Python\n\n")
        for name, fname in pages:
            f.write(f"- [`{name}`]({fname})\n")
        f.write("\n## Native\n\n- [C ABI](c_abi.md)\n"
                "- [C++ consumer API](cpp.md)\n")
    print(f"wrote {len(pages) + 3} pages to {outdir}")


if __name__ == "__main__":
    main()

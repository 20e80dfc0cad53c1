"""A structural gradio stand-in faithful enough to execute webui.start().

gradio cannot be installed in the build environment (zero egress), so the
round-2 webui test stubbed only ``gr.update`` and called the callbacks
directly — which verifies nothing about the EVENT WIRING (input/output
component lists, slider defaults reaching the callbacks, generator
streaming through an event chain).  This fake implements the Blocks API
surface webui.py uses — components record their construction kwargs,
``submit``/``click``/``then`` record dependencies, ``queue().launch`` is
captured — and adds :class:`Harness` to FIRE events exactly the way gradio
does: read input component values, call the callback, drain generators,
write outputs back to components, run ``.then`` chains.

This is a test double, not gradio; the real-gradio smoke job
(ci/webui_smoke.sh) runs wherever gradio is installable.
"""

from __future__ import annotations

import inspect


class _Update(dict):
    pass


def update(**kwargs):
    return _Update(kwargs)


class Component:
    _n = 0

    def __init__(self, *args, **kwargs):
        Component._n += 1
        self.uid = Component._n
        self.kind = type(self).__name__
        self.args = args
        self.kwargs = kwargs
        self.value = kwargs.get("value", args[0] if args else None)
        self.events: list[Dependency] = []
        ctx = _BLOCKS_STACK[-1] if _BLOCKS_STACK else None
        if ctx is not None:
            ctx.components.append(self)

    def _event(self, fn, inputs, outputs):
        dep = Dependency(fn, _as_list(inputs), _as_list(outputs))
        self.events.append(dep)
        return dep

    def submit(self, fn, inputs=None, outputs=None):
        return self._event(fn, inputs, outputs)

    def click(self, fn, inputs=None, outputs=None):
        return self._event(fn, inputs, outputs)


def _as_list(x):
    if x is None:
        return []
    return list(x) if isinstance(x, (list, tuple)) else [x]


class Dependency:
    def __init__(self, fn, inputs, outputs):
        self.fn = fn
        self.inputs = inputs
        self.outputs = outputs
        self.next: list[Dependency] = []

    def then(self, fn, inputs=None, outputs=None):
        dep = Dependency(fn, _as_list(inputs), _as_list(outputs))
        self.next.append(dep)
        return dep


class Markdown(Component):
    pass


class Image(Component):
    pass


class Button(Component):
    pass


class Slider(Component):
    def __init__(self, minimum=0, maximum=1, *args, **kwargs):
        super().__init__(**kwargs)
        self.minimum = minimum
        self.maximum = maximum
        self.step = kwargs.get("step")
        self.label = kwargs.get("label")


class Chatbot(Component):
    pass


class Textbox(Component):
    pass


class State(Component):
    pass


class Row(Component):
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class Column(Component):
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


_BLOCKS_STACK: list["Blocks"] = []
LAUNCHED: list[dict] = []


class Blocks:
    def __init__(self, *a, **kw):
        self.components: list[Component] = []

    def __enter__(self):
        _BLOCKS_STACK.append(self)
        return self

    def __exit__(self, *a):
        _BLOCKS_STACK.pop()
        return False

    def queue(self, *a, **kw):
        return self

    def launch(self, *a, **kw):
        LAUNCHED.append({"blocks": self, **kw})


class Harness:
    """Fire events the way gradio's runtime does."""

    def __init__(self, blocks: Blocks):
        self.blocks = blocks

    def find(self, kind: str, label: str | None = None) -> Component:
        for c in self.blocks.components:
            if c.kind == kind and (label is None or c.kwargs.get("label") == label):
                return c
        raise KeyError((kind, label))

    def fire(self, dep: Dependency):
        """Validate arity, call with input VALUES, stream generators,
        write outputs back; then run the chain."""
        sig = inspect.signature(dep.fn)
        n_params = len([
            p for p in sig.parameters.values()
            if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        ])
        if len(dep.inputs) > n_params:
            raise TypeError(
                f"{dep.fn.__name__}: {len(dep.inputs)} wired inputs but the "
                f"callback accepts {n_params}")
        vals = [c.value for c in dep.inputs]
        out = dep.fn(*vals)
        if inspect.isgenerator(out):
            last = None
            n = 0
            for item in out:
                last = item
                n += 1
                self._write(dep, item)
            out = last
            self.last_stream_len = n
        else:
            self._write(dep, out)
        for nxt in dep.next:
            self.fire(nxt)
        return out

    def _write(self, dep: Dependency, result):
        if not dep.outputs:
            return
        items = result if isinstance(result, tuple) else (result,)
        if len(items) != len(dep.outputs):
            raise TypeError(
                f"{dep.fn.__name__}: returned {len(items)} values for "
                f"{len(dep.outputs)} wired outputs")
        for comp, item in zip(dep.outputs, items):
            if isinstance(item, _Update):
                if "value" in item:
                    comp.value = item["value"]
                comp.kwargs.update(item)
            else:
                comp.value = item

"""A faithful, minimal recording stub of the gradio API surface that
apps/gradio_ui.py's Blocks construction uses (Blocks/Accordion/Row +
Dropdown/Slider/Textbox/Button/Gallery/Video, .click/.select bindings).

gradio is not installable in this environment, so the real Blocks UI
(reference gradio_ui.py:286-338) cannot render here; this stub lets tests
EXECUTE the construction code and then drive the recorded event bindings
end-to-end (tests/test_gradio_blocks.py). It records exactly what gradio
would be handed — component constructor args and (fn, inputs, outputs)
event triples — and makes them queryable.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional


@dataclasses.dataclass
class Binding:
    fn: Callable
    inputs: list
    outputs: list


def _as_list(x) -> list:
    if x is None:
        return []
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]


class StubGradio:
    """Instantiate one per test; use like the `gradio` module:
    `with gr.Blocks() as demo: ... gr.Button("go").click(fn, a, b)`."""

    def __init__(self):
        self.components: list[Component] = []
        self.containers: list[Container] = []
        gr = self

        class Component:
            def __init__(self, *args, **kwargs):
                self.args = args
                self.kwargs = kwargs
                label = kwargs.get("label")
                if label is None and args and isinstance(args[0], str):
                    label = args[0]
                self.label: Optional[str] = label
                self.click_bindings: list[Binding] = []
                self.select_bindings: list[Binding] = []
                gr.components.append(self)

            def click(self, fn, inputs=None, outputs=None):
                self.click_bindings.append(Binding(fn, _as_list(inputs), _as_list(outputs)))
                return self

            def select(self, fn, inputs=None, outputs=None):
                self.select_bindings.append(Binding(fn, _as_list(inputs), _as_list(outputs)))
                return self

        class Container:
            def __init__(self, *args, **kwargs):
                self.args = args
                self.kwargs = kwargs
                gr.containers.append(self)

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

        class Blocks(Container):
            def launch(self, **kwargs):
                self.launch_kwargs = kwargs

        self.Component = Component
        self.Blocks = Blocks
        self.Accordion = type("Accordion", (Container,), {})
        self.Row = type("Row", (Container,), {})
        for name in ("Dropdown", "Slider", "Textbox", "Button", "Gallery", "Video"):
            setattr(self, name, type(name, (Component,), {}))

    # ---- query helpers for tests ------------------------------------
    def of_type(self, name: str) -> list:
        return [c for c in self.components if type(c).__name__ == name]

    def button(self, label: str):
        (b,) = [c for c in self.of_type("Button") if c.label == label]
        return b

    def bound_fn(self, label: str) -> Binding:
        (binding,) = self.button(label).click_bindings
        return binding

"""Logging & results (reference utils.py ~L10-90: setup_logging + ResultsLog).

ResultsLog keeps the reference's pandas-CSV contract and adds structured
JSONL (the serving/bench metrics format per SURVEY.md section 5); the bokeh
HTML plots become matplotlib PNG + a self-contained HTML table (bokeh is not
in this image)."""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, List, Optional

import pandas as pd


def setup_logging(log_file: str = "log.txt", level=logging.INFO) -> None:
    """File + console logging (reference setup_logging)."""
    os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
    logging.basicConfig(
        level=level,
        format="%(asctime)s - %(levelname)s - %(message)s",
        handlers=[logging.FileHandler(log_file), logging.StreamHandler()],
        force=True,
    )


class ResultsLog:
    """Accumulate per-epoch rows; persist CSV (+JSONL) and render plots/HTML.

    API parity with the reference: ``add(**kwargs)``, ``plot(x, y, ...)``,
    ``save(title)``.
    """

    def __init__(self, path: str = "results.csv", plot_path: Optional[str] = None):
        self.path = path
        self.plot_path = plot_path or (os.path.splitext(path)[0] + ".html")
        self.jsonl_path = os.path.splitext(path)[0] + ".jsonl"
        self.results = pd.DataFrame()
        self._figures: List[Any] = []

    def add(self, **kwargs):
        row = pd.DataFrame([kwargs])
        self.results = pd.concat([self.results, row], ignore_index=True)
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps({"ts": time.time(), **{k: _jsonable(v) for k, v in kwargs.items()}}) + "\n")

    def plot(self, x: str, y, title: Optional[str] = None, ylabel: Optional[str] = None, **_):
        ys = [y] if isinstance(y, str) else list(y)
        self._figures.append({"x": x, "y": ys, "title": title or ",".join(ys), "ylabel": ylabel})

    def save(self, title: str = "results"):
        self.results.to_csv(self.path, index=False)
        html = [f"<html><head><title>{title}</title></head><body><h1>{title}</h1>"]
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            for i, fig in enumerate(self._figures):
                f, ax = plt.subplots(figsize=(6, 4))
                for col in fig["y"]:
                    if col in self.results and fig["x"] in self.results:
                        ax.plot(self.results[fig["x"]], self.results[col], label=col)
                ax.set_xlabel(fig["x"])
                if fig["ylabel"]:
                    ax.set_ylabel(fig["ylabel"])
                ax.legend()
                ax.set_title(fig["title"])
                png = os.path.splitext(self.path)[0] + f"_fig{i}.png"
                f.savefig(png, dpi=80)
                plt.close(f)
                html.append(f'<img src="{os.path.basename(png)}"/>')
        except Exception as e:  # headless-safe
            html.append(f"<p>plots unavailable: {e}</p>")
        html.append(self.results.to_html(index=False))
        html.append("</body></html>")
        with open(self.plot_path, "w") as f:
            f.write("\n".join(html))


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return float(v) if hasattr(v, "__float__") else str(v)

#!/usr/bin/env python
"""Populate ``web/static/samples/`` for the demo gallery.

The reference fetches 8 COCO/Flickr photos (``tools/download_samples.py``).
This tool tries the same kind of fetch, and in zero-egress environments
falls back to rendering synthetic scenes so the web demo always has a
gallery to show.  Skip-if-cached, like the reference.
"""

from __future__ import annotations

import os
import sys
import urllib.request

import click

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLE_URLS = {
    "street_traffic.jpg": "http://images.cocodataset.org/val2017/000000001296.jpg",
    "city_intersection.jpg": "http://images.cocodataset.org/val2017/000000577539.jpg",
    "pedestrians.jpg": "http://images.cocodataset.org/val2017/000000007977.jpg",
    "highway_cars.jpg": "http://images.cocodataset.org/val2017/000000104612.jpg",
    "bus_station.jpg": "http://images.cocodataset.org/val2017/000000571893.jpg",
    "cyclists.jpg": "http://images.cocodataset.org/val2017/000000022396.jpg",
    "crosswalk.jpg": "http://images.cocodataset.org/val2017/000000397133.jpg",
    "parking_lot.jpg": "http://images.cocodataset.org/val2017/000000037777.jpg",
}


def samples_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "web", "static", "samples")


@click.command()
@click.option("--synthetic-only", is_flag=True, help="skip network, render scenes")
@click.option("--count", default=8, type=int)
def main(synthetic_only: bool, count: int):
    import cv2

    out_dir = samples_dir()
    os.makedirs(out_dir, exist_ok=True)
    got = 0
    if not synthetic_only:
        for name, url in list(SAMPLE_URLS.items())[:count]:
            dest = os.path.join(out_dir, name)
            if os.path.exists(dest):
                got += 1
                continue
            try:
                urllib.request.urlretrieve(url, dest)
                got += 1
                click.echo(f"fetched {name}")
            except Exception:
                click.echo(f"fetch failed for {name} (no egress?)", err=True)
                break
    if got < max(3, count // 2):
        from rtmodt_tpu.utils.synthetic import moving_boxes_frame

        for i in range(count):
            dest = os.path.join(out_dir, f"synthetic_scene_{i+1}.jpg")
            if os.path.exists(dest):
                continue
            frame, _ = moving_boxes_frame(i * 13, 720, 1280,
                                          n_objects=4 + i % 4, seed=i)
            cv2.imwrite(dest, frame)
        click.echo(f"rendered synthetic gallery in {out_dir}")
    click.echo(f"samples ready: {len(os.listdir(out_dir))} files")


if __name__ == "__main__":
    main()

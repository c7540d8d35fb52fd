"""LTVM command line — the reference's (unbuilt) `LTVM` executable role
(LTVM_main.cpp:112-303): load an stfs pose graph, curate the long-term vector
map, write the vector map and SDF rasters.
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser():
    p = argparse.ArgumentParser(prog="ltvm-tpu", description=__doc__)
    p.add_argument("-P", "--pose-graph", required=True, nargs="+",
                   help="one or more .stfs.covars sessions to curate in order")
    p.add_argument("-o", "--output", default="ltvm_out")
    p.add_argument("--resolution", type=float, default=0.04)
    return p


def main(argv=None) -> int:
    from .utils.timing import install_crash_guard

    install_crash_guard()
    args = build_parser().parse_args(argv)
    from .core.state import make_map_state
    from .io import stfs
    from .models.ltvm.curator import CuratorParams, LongTermVectorMap
    from .ops.sdf import SdfParams

    params = CuratorParams()
    params.sdf = SdfParams(image_resolution=args.resolution)
    curator = LongTermVectorMap(params)
    for path in args.pose_graph:
        data = stfs.load_stfs_covars(path)
        st = make_map_state(data.poses, data.covariances, data.point_clouds,
                            data.normal_clouds)
        t0 = time.perf_counter()
        vectors = curator.curate(st.poses, st.points, st.point_mask)
        print(f"curated {path}: {len(vectors)} vectors "
              f"({time.perf_counter() - t0:.2f}s)")
    curator.save_vectors(args.output + ".vectors.txt")
    curator.save_sdf(args.output + ".weights.png", args.output + ".values.png")
    print(f"wrote {args.output}.vectors.txt and SDF rasters")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""mtsimport: convert a Wavefront OBJ (+MTL) into a scene XML with
extracted .serialized meshes — the OBJ path of the reference converter
(mitsuba/src/converter/{mtsimport.cpp,obj.cpp}).

Mirrors the reference's conversion rules (obj.cpp:79-231): each MTL
material becomes a <bsdf> — `mask` wrapping `diffuse` when map_d is
present, plain `diffuse` otherwise, with map_Kd as a bitmap texture and
Kd as an rgb reflectance; the OBJ splits into one submesh per usemtl
run, each saved as meshes/<name>.serialized and referenced from a
<shape type="serialized"> entry (meshes without a known material get a
default diffuse). The emitted scene header uses the reference's
<integrator type="direct"/> default. COLLADA (.dae) input dispatches to
tools/collada.py (the reference's collada.cpp path).

Usage: python -m ppg_tpu.tools.mtsimport input.obj output.xml
"""

from __future__ import annotations

import os
import sys

import numpy as np


def parse_mtl(path):
    """-> ordered dict name -> {kd: (r,g,b), map_kd: str|None,
    map_d: str|None} (obj.cpp:110-150 reads Kd/map_Kd/map_d)."""
    mats = {}
    cur = None
    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "newmtl":
                cur = " ".join(parts[1:])
                mats[cur] = {"kd": (0.5, 0.5, 0.5), "map_kd": None,
                             "map_d": None}
            elif cur is None:
                continue
            elif key == "Kd":
                mats[cur]["kd"] = tuple(float(x) for x in parts[1:4])
            elif key == "map_Kd":
                mats[cur]["map_kd"] = " ".join(parts[1:])
            elif key == "map_d":
                mats[cur]["map_d"] = " ".join(parts[1:])
    return mats


def parse_obj_grouped(path):
    """OBJ -> [(mtl_name, mesh_dict)] split by usemtl runs, plus the
    list of referenced mtllib files. Meshes are (v, vt, vn)-unified like
    io/obj.py but per submesh."""
    positions, normals, texcoords = [], [], []
    groups = []  # (mtl, corners)
    corners = []
    cur_mtl = ""
    mtllibs = []

    def flush():
        nonlocal corners
        if corners:
            groups.append((cur_mtl, corners))
            corners = []

    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            key = parts[0]
            if key == "v":
                positions.append(tuple(float(x) for x in parts[1:4]))
            elif key == "vn":
                normals.append(tuple(float(x) for x in parts[1:4]))
            elif key == "vt":
                texcoords.append((float(parts[1]), float(parts[2])))
            elif key == "usemtl":
                flush()
                cur_mtl = " ".join(parts[1:])
            elif key == "mtllib":
                mtllibs.append(" ".join(parts[1:]))
            elif key == "f":
                face = []
                for tok in parts[1:]:
                    sub = tok.split("/")
                    vi = int(sub[0])
                    ti = int(sub[1]) if len(sub) > 1 and sub[1] else 0
                    ni = int(sub[2]) if len(sub) > 2 and sub[2] else 0
                    face.append((vi, ti, ni))
                for k in range(1, len(face) - 1):
                    corners.extend((face[0], face[k], face[k + 1]))
    flush()

    nv, nt, nn = len(positions), len(texcoords), len(normals)

    def fix(idx, count):
        return idx - 1 if idx > 0 else (count + idx if idx < 0 else -1)

    meshes = []
    for mtl, cs in groups:
        arr = np.array([(fix(v, nv), fix(t, nt), fix(n, nn))
                        for v, t, n in cs], np.int64).reshape(-1, 3)
        uniq, inverse = np.unique(arr, axis=0, return_inverse=True)
        mesh = {
            "positions": np.asarray(positions, np.float64)[uniq[:, 0]],
            "faces": inverse.reshape(-1, 3).astype(np.int32),
            "normals": (np.asarray(normals, np.float64)[uniq[:, 2]]
                        if nn and (uniq[:, 2] >= 0).all() else None),
            "texcoords": (np.asarray(texcoords, np.float64)[uniq[:, 1]]
                          if nt and (uniq[:, 1] >= 0).all() else None),
        }
        meshes.append((mtl, mesh))
    return meshes, mtllibs


def _material_xml(name, m):
    """One MTL material -> bsdf XML (obj.cpp:79-108)."""
    lines = []
    ind = "\t"
    if m["map_d"]:
        lines.append(f'\t<bsdf id="{name}_material" type="mask">')
        lines.append(f'\t\t<texture name="opacity" type="bitmap">')
        lines.append(f'\t\t\t<string name="filename" value="{m["map_d"]}"/>')
        lines.append("\t\t</texture>")
        lines.append('\t\t<bsdf type="diffuse">')
        ind = "\t\t"
    else:
        lines.append(f'\t<bsdf id="{name}_material" type="diffuse">')
    if m["map_kd"]:
        lines.append(f'{ind}\t<texture name="reflectance" type="bitmap">')
        lines.append(f'{ind}\t\t<string name="filename" '
                     f'value="{m["map_kd"]}"/>')
        lines.append(f"{ind}\t</texture>")
    else:
        r, g, b = m["kd"]
        lines.append(f'{ind}\t<rgb name="reflectance" '
                     f'value="{r} {g} {b}"/>')
    lines.append(f"{ind}</bsdf>")
    if m["map_d"]:
        lines.append("\t</bsdf>")
    return "\n".join(lines)


def convert(input_obj, output_xml, meshes_dir=None):
    from ..io.serialized import save_serialized

    out_dir = os.path.dirname(os.path.abspath(output_xml))
    meshes_dir = meshes_dir or os.path.join(out_dir, "meshes")
    os.makedirs(meshes_dir, exist_ok=True)

    meshes, mtllibs = parse_obj_grouped(input_obj)
    mats = {}
    for lib in mtllibs:
        full = os.path.join(os.path.dirname(os.path.abspath(input_obj)), lib)
        if os.path.exists(full):
            mats.update(parse_mtl(full))
        else:
            print(f"warning: material library {lib!r} not found",
                  file=sys.stderr)

    xml = ['<?xml version="1.0" encoding="utf-8"?>', "",
           "<!-- Automatically converted from Wavefront OBJ -->", "",
           '<scene version="0.5.0">',
           '\t<integrator id="integrator" type="direct"/>', ""]
    for name, m in mats.items():
        xml.append(_material_xml(name, m))
        xml.append("")

    stem = os.path.splitext(os.path.basename(input_obj))[0]
    for i, (mtl, mesh) in enumerate(meshes):
        mesh_name = f"{stem}_{i}"
        fn = f"{mesh_name}.serialized"
        mesh = dict(mesh, name=mesh_name)
        save_serialized(os.path.join(meshes_dir, fn), [mesh])
        xml.append(f'\t<shape id="{mesh_name}_mesh" type="serialized">')
        xml.append(f'\t\t<string name="filename" value="meshes/{fn}"/>')
        if mtl in mats:
            xml.append(f'\t\t<ref name="bsdf" id="{mtl}_material"/>')
        else:
            xml.append('\t\t<bsdf type="diffuse"/>')
        xml.append("\t</shape>")
        xml.append("")
    xml.append("</scene>")
    with open(output_xml, "w") as f:
        f.write("\n".join(xml) + "\n")
    return len(meshes)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        return 1
    inp, outp = argv[0], argv[1]
    if inp.lower().endswith((".dae", ".zae")):
        from .collada import convert as convert_dae

        n = convert_dae(inp, outp)
    else:
        n = convert(inp, outp)
    print(f"wrote {outp} ({n} meshes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

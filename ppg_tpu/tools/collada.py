"""COLLADA (.dae) -> scene XML + .serialized meshes converter.

The reference's mtsimport converts COLLADA documents to Mitsuba scenes
(mitsuba/src/converter/collada.cpp, 2541 LoC using the COLLADA DOM).
This is the dependency-free equivalent built on ElementTree: geometry
sources/accessors, <triangles>/<polylist>/<polygons> (fan-triangulated),
the visual-scene node hierarchy with matrix/translate/rotate/scale
transforms and geometry/camera/light instancing, profile_COMMON effects
(lambert -> diffuse, phong/blinn -> phong, diffuse textures via
library_images), perspective cameras, point/directional/spot/ambient
lights, and Z_UP/Y_UP handling. Meshes are written with
io.serialized.save_serialized and referenced as <shape type="serialized">
with per-node toWorld transforms, mirroring the converter's output
shape.

Usage: python -m ppg_tpu.tools.collada input.dae output.xml
(or via mtsimport, which dispatches on the input extension).
"""

from __future__ import annotations

import os
import re
import sys
import xml.etree.ElementTree as ET

import numpy as np


def _strip_ns(root):
    for el in root.iter():
        if isinstance(el.tag, str) and "}" in el.tag:
            el.tag = el.tag.split("}", 1)[1]
    return root


def _floats(text):
    toks = (text or "").split()
    return np.asarray(toks, np.float64) if toks else np.zeros(0)


def _ints(text):
    toks = (text or "").split()
    return np.asarray(toks, np.int64) if toks else np.zeros(0, np.int64)


class Collada:
    def __init__(self, path):
        self.root = _strip_ns(ET.parse(path).getroot())
        self.dir = os.path.dirname(os.path.abspath(path))
        self.by_id = {e.attrib["id"]: e
                      for e in self.root.iter() if "id" in e.attrib}
        up = self.root.findtext("asset/up_axis", "Y_UP").strip()
        # Z_UP scenes get a -90deg x-rotation so +y is up (collada.cpp
        # asset handling)
        self.up_fix = up == "Z_UP"

    def ref(self, url):
        return self.by_id.get(url.lstrip("#"))

    # -- geometry ------------------------------------------------------------

    def _source_array(self, mesh, source_id):
        src = self.ref(source_id)
        if src is None:
            return None
        arr = _floats(src.findtext("float_array", ""))
        acc = src.find("technique_common/accessor")
        stride = int(acc.attrib.get("stride", 1)) if acc is not None else 3
        return arr.reshape(-1, stride)

    def mesh_arrays(self, geom):
        """One <geometry> -> dict(positions, faces, normals?, uvs?) with
        per-corner indices resolved to unified vertices."""
        mesh = geom.find("mesh")
        if mesh is None:  # splines etc.
            return None
        verts = mesh.find("vertices")
        pos_src = None
        for inp in verts.findall("input"):
            if inp.attrib.get("semantic") == "POSITION":
                pos_src = self._source_array(mesh, inp.attrib["source"])
        if pos_src is None:
            return None
        out_idx = {"V": [], "N": [], "T": []}
        sources = {}
        prims = [p for tag in ("triangles", "polylist", "polygons")
                 for p in mesh.findall(tag)]
        for prim in prims:
            inputs = prim.findall("input")
            stride = 1 + max((int(i.attrib.get("offset", 0))
                              for i in inputs), default=0)
            offs = {}
            for i in inputs:
                sem = i.attrib["semantic"]
                off = int(i.attrib.get("offset", 0))
                if sem == "VERTEX":
                    offs["V"] = off
                elif sem == "NORMAL":
                    offs["N"] = off
                    sources["N"] = self._source_array(mesh,
                                                      i.attrib["source"])
                elif sem == "TEXCOORD" and "T" not in offs:
                    offs["T"] = off
                    sources["T"] = self._source_array(mesh,
                                                      i.attrib["source"])
            if prim.tag == "polygons":
                polys = [_ints(p.text) for p in prim.findall("p")]
            else:
                flat = _ints(" ".join(p.text or "" for p in
                                      prim.findall("p")))
                if prim.tag == "polylist":
                    vcount = _ints(prim.findtext("vcount", ""))
                    polys, at = [], 0
                    for n in vcount:
                        polys.append(flat[at:at + n * stride])
                        at += n * stride
                else:
                    polys = [flat[i:i + 3 * stride]
                             for i in range(0, len(flat), 3 * stride)]
            for poly in polys:
                corners = poly.reshape(-1, stride)
                for k in range(1, len(corners) - 1):  # fan-triangulate
                    for c in (corners[0], corners[k], corners[k + 1]):
                        out_idx["V"].append(int(c[offs["V"]]))
                        if "N" in offs:
                            out_idx["N"].append(int(c[offs["N"]]))
                        if "T" in offs:
                            out_idx["T"].append(int(c[offs["T"]]))
        if not out_idx["V"]:
            return None
        nc = len(out_idx["V"])
        vi = np.asarray(out_idx["V"], np.int64)
        positions = pos_src[vi, :3]
        mesh_out = dict(
            positions=positions.astype(np.float64),
            faces=np.arange(nc, dtype=np.int64).reshape(-1, 3),
        )
        if out_idx["N"] and sources.get("N") is not None:
            mesh_out["normals"] = sources["N"][
                np.asarray(out_idx["N"], np.int64), :3].astype(np.float64)
        if out_idx["T"] and sources.get("T") is not None:
            mesh_out["texcoords"] = sources["T"][
                np.asarray(out_idx["T"], np.int64), :2].astype(np.float64)
        # material symbol of the first primitive (per-geometry binding)
        mesh_out["material"] = prims[0].attrib.get("material") if prims \
            else None
        return mesh_out

    # -- effects / materials ---------------------------------------------------

    def _color(self, el, default=(0.5, 0.5, 0.5)):
        if el is None:
            return np.asarray(default), None
        c = el.find("color")
        if c is not None:
            return _floats(c.text)[:3], None
        tex = el.find("texture")
        if tex is not None:
            return np.asarray(default), self._resolve_texture(
                tex.attrib.get("texture"))
        return np.asarray(default), None

    def _resolve_texture(self, sampler_sid):
        """sampler sid -> image path (follows newparam sampler/surface
        chains, falling back to a direct image id)."""
        img = self.by_id.get(sampler_sid)
        for np_el in self.root.iter("newparam"):
            if np_el.attrib.get("sid") != sampler_sid:
                continue
            src = np_el.findtext("sampler2D/source")
            for np2 in self.root.iter("newparam"):
                if np2.attrib.get("sid") == src:
                    img_id = np2.findtext("surface/init_from")
                    img = self.by_id.get(img_id)
        if img is None:
            return None
        init = img.findtext("init_from", "").strip()
        return init.replace("file://", "") or None

    def material(self, mat_id):
        """<material>/<effect> -> dict(kind, diffuse, texture, specular,
        shininess)."""
        mat = self.ref(mat_id) if mat_id else None
        out = dict(kind="lambert", diffuse=np.asarray([0.5, 0.5, 0.5]),
                   texture=None, specular=np.zeros(3), shininess=0.0)
        if mat is None:
            return out
        ie = mat.find("instance_effect")
        eff = self.ref(ie.attrib["url"]) if ie is not None else None
        if eff is None:
            return out
        for kind in ("lambert", "phong", "blinn", "constant"):
            t = eff.find(f"profile_COMMON/technique/{kind}")
            if t is None:
                continue
            out["kind"] = kind
            out["diffuse"], out["texture"] = self._color(t.find("diffuse"))
            spec, _ = self._color(t.find("specular"), (0, 0, 0))
            out["specular"] = spec
            sh = t.findtext("shininess/float")
            out["shininess"] = float(sh) if sh else 0.0
            break
        return out

    # -- scene graph ----------------------------------------------------------

    def node_transform(self, node):
        m = np.eye(4)
        for el in node:
            if el.tag == "matrix":
                m = m @ _floats(el.text).reshape(4, 4)
            elif el.tag == "translate":
                t = _floats(el.text)
                mm = np.eye(4)
                mm[:3, 3] = t[:3]
                m = m @ mm
            elif el.tag == "rotate":
                x, y, z, ang = _floats(el.text)[:4]
                from ..core import transform as tf

                m = m @ tf.rotate([x, y, z], ang)
            elif el.tag == "scale":
                s = _floats(el.text)
                m = m @ np.diag([s[0], s[1], s[2], 1.0])
        return m

    def walk(self, node, parent_m):
        m = parent_m @ self.node_transform(node)
        for el in node:
            if el.tag == "instance_geometry":
                binds = {im.attrib["symbol"]: im.attrib["target"]
                         for im in el.iter("instance_material")}
                yield ("geometry", self.ref(el.attrib["url"]), m, binds)
            elif el.tag == "instance_camera":
                yield ("camera", self.ref(el.attrib["url"]), m, None)
            elif el.tag == "instance_light":
                yield ("light", self.ref(el.attrib["url"]), m, None)
            elif el.tag == "node":
                yield from self.walk(el, m)

    def instances(self):
        vs = self.root.find("library_visual_scenes/visual_scene")
        if vs is None:
            return
        base = np.eye(4)
        if self.up_fix:
            from ..core import transform as tf

            base = tf.rotate([1.0, 0.0, 0.0], -90.0)
        for node in vs.findall("node"):
            yield from self.walk(node, base)


def _fmt_matrix(m):
    return " ".join(f"{v:.9g}" for v in np.asarray(m, np.float64).ravel())


def _mat_xml(name, m, tex_rel):
    lines = [f'\t<bsdf id="{name}_material" type='
             f'"{"phong" if m["kind"] in ("phong", "blinn") else "diffuse"}">']
    refl = "diffuseReflectance" if m["kind"] in ("phong", "blinn") \
        else "reflectance"
    if tex_rel:
        lines.append(f'\t\t<texture name="{refl}" type="bitmap">')
        lines.append(f'\t\t\t<string name="filename" value="{tex_rel}"/>')
        lines.append("\t\t</texture>")
    else:
        d = m["diffuse"]
        lines.append(f'\t\t<rgb name="{refl}" '
                     f'value="{d[0]:.6g} {d[1]:.6g} {d[2]:.6g}"/>')
    if m["kind"] in ("phong", "blinn"):
        s = m["specular"]
        lines.append(f'\t\t<rgb name="specularReflectance" '
                     f'value="{s[0]:.6g} {s[1]:.6g} {s[2]:.6g}"/>')
        lines.append(f'\t\t<float name="exponent" '
                     f'value="{max(m["shininess"], 1.0):.6g}"/>')
    lines.append("\t</bsdf>")
    return "\n".join(lines)


def convert(input_dae, output_xml, meshes_dir=None):
    from ..io.serialized import save_serialized

    dae = Collada(input_dae)
    out_dir = os.path.dirname(os.path.abspath(output_xml))
    meshes_dir = meshes_dir or os.path.join(out_dir, "meshes")
    os.makedirs(meshes_dir, exist_ok=True)

    xml = ['<?xml version="1.0" encoding="utf-8"?>', "",
           "<!-- Automatically converted from COLLADA -->", "",
           '<scene version="0.5.0">',
           '\t<integrator id="integrator" type="direct"/>', ""]
    stem = re.sub(r"\W+", "_", os.path.splitext(
        os.path.basename(input_dae))[0])
    mats_done = {}
    n_shapes = 0
    sensor_done = False
    for kind, target, m, binds in dae.instances():
        if target is None:
            continue
        if kind == "geometry":
            mesh = dae.mesh_arrays(target)
            if mesh is None:
                continue
            sym = mesh.pop("material", None)
            mat_id = (binds or {}).get(sym, sym)
            mat_name = re.sub(r"\W+", "_", (mat_id or "default").lstrip("#"))
            if mat_name not in mats_done:
                mspec = dae.material(mat_id)
                tex_rel = None
                if mspec["texture"]:
                    tex_rel = os.path.relpath(
                        os.path.join(dae.dir, mspec["texture"]), out_dir)
                xml.append(_mat_xml(mat_name, mspec, tex_rel))
                xml.append("")
                mats_done[mat_name] = True
            name = f"{stem}_{n_shapes}"
            mesh["name"] = name
            save_serialized(os.path.join(meshes_dir, f"{name}.serialized"),
                            [mesh])
            xml.append(f'\t<shape id="{name}_mesh" type="serialized">')
            xml.append(f'\t\t<string name="filename" '
                       f'value="meshes/{name}.serialized"/>')
            xml.append('\t\t<transform name="toWorld">')
            xml.append(f'\t\t\t<matrix value="{_fmt_matrix(m)}"/>')
            xml.append("\t\t</transform>")
            xml.append(f'\t\t<ref name="bsdf" id="{mat_name}_material"/>')
            xml.append("\t</shape>")
            xml.append("")
            n_shapes += 1
        elif kind == "camera" and not sensor_done:
            sensor_done = True
            persp = target.find("optics/technique_common/perspective")
            fov = "45"
            axis = "x"
            if persp is not None:
                xf = persp.findtext("xfov")
                yf = persp.findtext("yfov")
                if xf:
                    fov = xf.strip()
                elif yf:
                    fov, axis = yf.strip(), "y"
            xml.append('\t<sensor type="perspective">')
            xml.append(f'\t\t<float name="fov" value="{fov}"/>')
            xml.append(f'\t\t<string name="fovAxis" value="{axis}"/>')
            xml.append('\t\t<transform name="toWorld">')
            # COLLADA cameras look down -Z; Mitsuba sensors look down +Z
            flip = m @ np.diag([-1.0, 1.0, -1.0, 1.0])
            xml.append(f'\t\t\t<matrix value="{_fmt_matrix(flip)}"/>')
            xml.append("\t\t</transform>")
            xml.append('\t\t<sampler type="independent"/>')
            xml.append('\t\t<film type="hdrfilm">')
            xml.append('\t\t\t<integer name="width" value="768"/>')
            xml.append('\t\t\t<integer name="height" value="576"/>')
            xml.append('\t\t\t<rfilter type="box"/>')
            xml.append("\t\t</film>")
            xml.append("\t</sensor>")
            xml.append("")
        elif kind == "light":
            tc = target.find("technique_common")
            if tc is None:
                continue
            pos = (m @ np.asarray([0.0, 0.0, 0.0, 1.0]))[:3]
            fwd = (m @ np.asarray([0.0, 0.0, -1.0, 0.0]))[:3]
            for lt in tc:
                col = _floats(lt.findtext("color", "1 1 1"))[:3]
                cs = f"{col[0]:.6g} {col[1]:.6g} {col[2]:.6g}"
                if lt.tag == "point":
                    xml.append('\t<emitter type="point">')
                    xml.append(f'\t\t<point name="position" '
                               f'value="{pos[0]:.6g} {pos[1]:.6g} '
                               f'{pos[2]:.6g}"/>')
                    xml.append(f'\t\t<rgb name="intensity" value="{cs}"/>')
                elif lt.tag == "directional":
                    xml.append('\t<emitter type="directional">')
                    xml.append(f'\t\t<vector name="direction" '
                               f'value="{fwd[0]:.6g} {fwd[1]:.6g} '
                               f'{fwd[2]:.6g}"/>')
                    xml.append(f'\t\t<rgb name="irradiance" value="{cs}"/>')
                elif lt.tag == "ambient":
                    xml.append('\t<emitter type="constant">')
                    xml.append(f'\t\t<rgb name="radiance" value="{cs}"/>')
                elif lt.tag == "spot":
                    xml.append('\t<emitter type="spot">')
                    xml.append('\t\t<transform name="toWorld">')
                    xml.append(f'\t\t\t<matrix value="'
                               f'{_fmt_matrix(m @ np.diag([-1.0, 1.0, -1.0, 1.0]))}"/>')
                    xml.append("\t\t</transform>")
                    xml.append(f'\t\t<rgb name="intensity" value="{cs}"/>')
                else:
                    continue
                xml.append("\t</emitter>")
                xml.append("")
    xml.append("</scene>")
    with open(output_xml, "w") as f:
        f.write("\n".join(xml) + "\n")
    return n_shapes


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        return 1
    n = convert(argv[0], argv[1])
    print(f"wrote {argv[1]} ({n} shapes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Scene flattening: PluginSpec tree -> SoA numpy arrays for the TPU tracer.

This replaces Mitsuba's Scene::initialize (reference librender/scene.cpp:
322-384): shapes expand to world-space triangles, BSDFs become rows of a
material parameter table, area emitters build per-triangle area CDFs and a
uniform scene-level emitter distribution (scene.cpp:376-381), and the scene
AABB feeds the guiding STree. Device upload happens in integrators via
`DeviceScene`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .shapes import build_shape
from .xml_parser import SceneXML, Spectrum

# Material type enum (device-side dispatch indices)
MAT_DIFFUSE = 0
MAT_CONDUCTOR = 1
MAT_ROUGHCONDUCTOR = 2
MAT_DIELECTRIC = 3
MAT_THINDIELECTRIC = 4
MAT_ROUGHDIELECTRIC = 5
MAT_PLASTIC = 6
MAT_ROUGHPLASTIC = 7
MAT_MASK = 8
MAT_NULL = 9
MAT_PHONG = 10
MAT_ROUGHDIFFUSE = 11
MAT_WARD = 12
MAT_DIFFTRANS = 13
MAT_BLEND = 14

MAT_NAMES = {
    "diffuse": MAT_DIFFUSE,
    "conductor": MAT_CONDUCTOR,
    "roughconductor": MAT_ROUGHCONDUCTOR,
    "dielectric": MAT_DIELECTRIC,
    "thindielectric": MAT_THINDIELECTRIC,
    "roughdielectric": MAT_ROUGHDIELECTRIC,
    "plastic": MAT_PLASTIC,
    "roughplastic": MAT_ROUGHPLASTIC,
    "mask": MAT_MASK,
    "null": MAT_NULL,
    "phong": MAT_PHONG,
    "roughdiffuse": MAT_ROUGHDIFFUSE,
    "ward": MAT_WARD,
    "difftrans": MAT_DIFFTRANS,
    "blendbsdf": MAT_BLEND,
    "mixturebsdf": MAT_BLEND,
}

DIST_BECKMANN = 0
DIST_GGX = 1
DIST_PHONG = 2

# named IOR presets (reference libcore ior data; common subset)
_IOR = {
    "vacuum": 1.0,
    "air": 1.000277,
    "water": 1.3330,
    "glass": 1.5046,
    "bk7": 1.5046,
    "diamond": 2.419,
    "pyrex": 1.470,
    "acrylic glass": 1.49,
    "polypropylene": 1.49,
}


def _rgb(v, default):
    if v is None:
        return np.array(default, np.float64)
    if isinstance(v, Spectrum):
        return np.asarray(v.rgb, np.float64)
    v = np.asarray(v, np.float64)
    return np.full(3, float(v)) if v.ndim == 0 else v


def _ior(props, key, default):
    v = props.get(key, default)
    if isinstance(v, str):
        return _IOR[v.lower()]
    return float(v)


@dataclass
class MaterialTable:
    mtype: np.ndarray
    twosided: np.ndarray
    reflectance: np.ndarray  # diffuse albedo / diffuseReflectance
    specular: np.ndarray  # specularReflectance scale
    transmittance: np.ndarray  # specularTransmittance scale
    eta: np.ndarray  # conductor eta (rgb)
    k: np.ndarray  # conductor k (rgb)
    int_ior: np.ndarray
    ext_ior: np.ndarray
    alpha_u: np.ndarray
    alpha_v: np.ndarray
    dist: np.ndarray
    nonlinear: np.ndarray
    opacity: np.ndarray  # mask opacity (rgb)
    nested: np.ndarray  # nested material row (mask/bumpmap), -1 otherwise
    tex_reflectance: np.ndarray  # texture id or -1
    tex_opacity: np.ndarray
    tex_alpha: np.ndarray
    tex_bump: np.ndarray
    exponent: np.ndarray  # phong
    bump_is_normal: np.ndarray = None  # tex_bump holds a normal map
    nested2: np.ndarray = None  # second child (blend/mixture), -1 otherwise
    blend_w: np.ndarray = None  # probability of child 2
    # derived quantities (filled by _derive): relative IOR, 1/eta^2,
    # smooth-plastic internal diffuse Fresnel reflectance, specular sampling
    # weight, rough transmittance table + its internal diffuse average
    eta_rel: np.ndarray = None
    inv_eta2: np.ndarray = None
    fdr_int: np.ndarray = None
    spec_weight: np.ndarray = None
    rt_ext: np.ndarray = None
    rt_fdr_int: np.ndarray = None

    @staticmethod
    def empty():
        z3 = np.zeros((0, 3))
        z = np.zeros((0,))
        zi = np.zeros((0,), np.int32)
        zb = np.zeros((0,), bool)
        return MaterialTable(
            zi, zb, z3, z3, z3, z3, z3, z, z, z, z, zi, zb, z3, zi, zi, zi, zi,
            zi, z, zb, zi, z, z, z, z, z, np.zeros((0, 64)), z
        )


class MaterialBuilder:
    def __init__(self, textures):
        self.rows = []
        self.cache = {}
        self.textures = textures

    def add(self, spec):
        key = id(spec)
        if key in self.cache:
            return self.cache[key]
        row = self._build(spec, twosided=False)
        self.cache[key] = row
        return row

    @staticmethod
    def _defaults():
        return dict(
            mtype=MAT_DIFFUSE,
            twosided=False,
            reflectance=np.full(3, 0.5),
            specular=np.ones(3),
            transmittance=np.ones(3),
            eta=np.zeros(3),
            k=np.ones(3),
            int_ior=1.5046,
            ext_ior=1.000277,
            alpha_u=0.1,
            alpha_v=0.1,
            dist=DIST_BECKMANN,
            nonlinear=False,
            opacity=np.full(3, 0.5),
            nested=-1,
            tex_reflectance=-1,
            tex_opacity=-1,
            tex_alpha=-1,
            tex_bump=-1,
            exponent=30.0,
            bump_is_normal=False,
            nested2=-1,
            blend_w=0.5,
        )

    def _texture(self, props, name):
        v = props.get(name)
        if hasattr(v, "cls") and getattr(v, "cls", None) == "texture":
            return self.textures.add(v), np.array([0.5, 0.5, 0.5])
        return -1, None

    def _build(self, spec, twosided):
        # unwrap adapters
        if spec.otype == "twosided":
            inner = spec.child("bsdf")
            if inner is None:
                raise ValueError("twosided: missing nested bsdf")
            return self._build(inner, twosided=True)
        if spec.otype in ("bumpmap", "normalmap"):
            # nested bsdf with a bump-height / normal texture: clone the
            # nested row and attach the perturbation texture
            inner = spec.child("bsdf")
            nested_row = self._build(inner, twosided=twosided)
            tex_spec = spec.child("texture")
            row = dict(self.rows[nested_row])
            if tex_spec is not None:
                tid = self.textures.add(tex_spec)
                row["tex_bump"] = tid
                row["bump_is_normal"] = spec.otype == "normalmap"
            self.rows.append(row)
            return len(self.rows) - 1

        if spec.otype in ("blendbsdf", "mixturebsdf"):
            kids = [c for c in spec.children if c.cls == "bsdf"]
            if len(kids) != 2:
                raise NotImplementedError(
                    f"{spec.otype} supports exactly 2 nested BSDFs here "
                    f"(got {len(kids)}); nest blends for more")
            if spec.otype == "blendbsdf":
                w = float(spec.props.get("weight", 0.5))
            else:
                ws = [float(x) for x in
                      str(spec.props.get("weights", "0.5, 0.5")).split(",")]
                w = ws[1] / max(ws[0] + ws[1], 1e-9)
            r0 = self._build(kids[0], twosided=twosided)
            r1 = self._build(kids[1], twosided=twosided)
            row = dict(self._defaults(), mtype=MAT_BLEND, twosided=twosided,
                       nested=r0, nested2=r1, blend_w=w)
            self.rows.append(row)
            return len(self.rows) - 1

        d = dict(self._defaults(), mtype=MAT_NAMES.get(spec.otype),
                 twosided=twosided)
        if d["mtype"] is None:
            raise NotImplementedError(f"bsdf type {spec.otype!r}")

        p = dict(spec.props)
        # nested texture children attach by their _name
        for c in spec.children_of("texture"):
            p[c.props.get("_name", "reflectance")] = c

        t = spec.otype
        if t in ("diffuse", "roughdiffuse"):
            tex, _ = self._texture(p, "reflectance")
            if tex >= 0:
                d["tex_reflectance"] = tex
            else:
                d["reflectance"] = _rgb(p.get("reflectance"), [0.5, 0.5, 0.5])
            d["alpha_u"] = d["alpha_v"] = float(p.get("alpha", 0.2))
        elif t in ("conductor", "roughconductor"):
            material = p.get("material", "cu")
            if material == "none":
                d["eta"] = np.zeros(3)
                d["k"] = np.ones(3)
            d["eta"] = _rgb(p.get("eta"), d["eta"])
            d["k"] = _rgb(p.get("k"), d["k"])
            d["specular"] = _rgb(p.get("specularReflectance"), [1, 1, 1])
            d["ext_ior"] = _ior(p, "extEta", 1.0)
            if t == "roughconductor":
                d["alpha_u"] = float(p.get("alphaU", p.get("alpha", 0.1)))
                d["alpha_v"] = float(p.get("alphaV", p.get("alpha", 0.1)))
                d["dist"] = {"beckmann": 0, "ggx": 1, "phong": 2}[
                    p.get("distribution", "beckmann")
                ]
        elif t in ("dielectric", "thindielectric", "roughdielectric"):
            d["int_ior"] = _ior(p, "intIOR", "bk7")
            d["ext_ior"] = _ior(p, "extIOR", "air")
            d["specular"] = _rgb(p.get("specularReflectance"), [1, 1, 1])
            d["transmittance"] = _rgb(p.get("specularTransmittance"), [1, 1, 1])
            if t == "roughdielectric":
                d["alpha_u"] = float(p.get("alphaU", p.get("alpha", 0.1)))
                d["alpha_v"] = float(p.get("alphaV", p.get("alpha", 0.1)))
                d["dist"] = {"beckmann": 0, "ggx": 1, "phong": 2}[
                    p.get("distribution", "beckmann")
                ]
        elif t in ("plastic", "roughplastic"):
            d["int_ior"] = _ior(p, "intIOR", "polypropylene")
            d["ext_ior"] = _ior(p, "extIOR", "air")
            tex, _ = self._texture(p, "diffuseReflectance")
            if tex >= 0:
                d["tex_reflectance"] = tex
            else:
                d["reflectance"] = _rgb(p.get("diffuseReflectance"), [0.5, 0.5, 0.5])
            d["specular"] = _rgb(p.get("specularReflectance"), [1, 1, 1])
            d["nonlinear"] = bool(p.get("nonlinear", False))
            if t == "roughplastic":
                d["alpha_u"] = d["alpha_v"] = float(p.get("alpha", 0.1))
                d["dist"] = {"beckmann": 0, "ggx": 1, "phong": 2}[
                    p.get("distribution", "beckmann")
                ]
        elif t == "mask":
            inner = spec.child("bsdf")
            d["nested"] = self._build(inner, twosided=twosided)
            tex, _ = self._texture(p, "opacity")
            if tex >= 0:
                d["tex_opacity"] = tex
            else:
                d["opacity"] = _rgb(p.get("opacity"), [0.5, 0.5, 0.5])
        elif t == "phong":
            d["exponent"] = float(p.get("exponent", 30.0))
            d["reflectance"] = _rgb(p.get("diffuseReflectance"), [0.5, 0.5, 0.5])
            d["specular"] = _rgb(p.get("specularReflectance"), [0.2, 0.2, 0.2])
        elif t == "ward":
            d["reflectance"] = _rgb(p.get("diffuseReflectance"), [0.5, 0.5, 0.5])
            d["specular"] = _rgb(p.get("specularReflectance"), [0.2, 0.2, 0.2])
            d["alpha_u"] = float(p.get("alphaU", p.get("alpha", 0.1)))
            d["alpha_v"] = float(p.get("alphaV", p.get("alpha", 0.1)))
        elif t == "difftrans":
            d["transmittance"] = _rgb(p.get("transmittance"), [0.5, 0.5, 0.5])
        self.rows.append(d)
        return len(self.rows) - 1

    def finalize(self) -> MaterialTable:
        if not self.rows:
            return MaterialTable.empty()

        def col(name, dtype=np.float64):
            return np.array([r[name] for r in self.rows], dtype)

        table = self._make_table(col)
        _derive(table)
        return table

    def _make_table(self, col):
        return MaterialTable(
            mtype=col("mtype", np.int32),
            twosided=col("twosided", bool),
            reflectance=col("reflectance"),
            specular=col("specular"),
            transmittance=col("transmittance"),
            eta=col("eta"),
            k=col("k"),
            int_ior=col("int_ior"),
            ext_ior=col("ext_ior"),
            alpha_u=col("alpha_u"),
            alpha_v=col("alpha_v"),
            dist=col("dist", np.int32),
            nonlinear=col("nonlinear", bool),
            opacity=col("opacity"),
            nested=col("nested", np.int32),
            tex_reflectance=col("tex_reflectance", np.int32),
            tex_opacity=col("tex_opacity", np.int32),
            tex_alpha=col("tex_alpha", np.int32),
            tex_bump=col("tex_bump", np.int32),
            exponent=col("exponent"),
            bump_is_normal=col("bump_is_normal", bool),
            nested2=col("nested2", np.int32),
            blend_w=col("blend_w"),
        )


def _derive(t: MaterialTable):
    """Fill the derived per-material quantities (plastic/roughplastic energy
    bookkeeping; reference rtrans.h + plastic.cpp:167-180 m_fdrInt etc.)."""
    from ..bsdf.derived import (
        RT_BINS,
        diffuse_transmittance,
        rough_transmittance_table,
    )
    from ..bsdf.fresnel import fresnel_diffuse_reflectance

    M = len(t.mtype)
    t.eta_rel = t.int_ior / np.maximum(t.ext_ior, 1e-9)
    t.inv_eta2 = 1.0 / np.maximum(t.eta_rel, 1e-9) ** 2
    t.fdr_int = np.zeros(M)
    t.spec_weight = np.zeros(M)
    t.rt_ext = np.ones((M, RT_BINS))
    t.rt_fdr_int = np.zeros(M)

    for i in range(M):
        mt = t.mtype[i]
        if mt == MAT_PLASTIC:
            t.fdr_int[i] = fresnel_diffuse_reflectance(1.0 / t.eta_rel[i])
            s_avg = t.specular[i].mean()
            d_avg = t.reflectance[i].mean()
            t.spec_weight[i] = s_avg / max(d_avg + s_avg, 1e-9)
        elif mt == MAT_ROUGHPLASTIC:
            dist = int(t.dist[i])
            alpha = float(t.alpha_u[i])
            eta = float(t.eta_rel[i])
            t.rt_ext[i] = rough_transmittance_table(dist, alpha, eta)
            rt_int = rough_transmittance_table(dist, alpha, 1.0 / eta)
            t.rt_fdr_int[i] = 1.0 - diffuse_transmittance(rt_int)
            s_avg = t.specular[i].mean()
            d_avg = t.reflectance[i].mean()
            t.spec_weight[i] = s_avg / max(d_avg + s_avg, 1e-9)


class TextureBuilder:
    """Collects bitmap textures into a list (atlas upload done lazily)."""

    def __init__(self, scene_xml):
        self.scene_xml = scene_xml
        self.specs = []

    def add(self, spec):
        self.specs.append(spec)
        return len(self.specs) - 1


@dataclass
class EmitterTable:
    radiance: np.ndarray  # [E, 3]
    tri_offset: np.ndarray  # [E]
    tri_count: np.ndarray  # [E]
    tri_ids: np.ndarray  # [sum counts] global triangle indices
    tri_cdf: np.ndarray  # [sum counts] per-emitter normalized area CDF
    inv_area: np.ndarray  # [E] 1 / total shape surface area
    num: int = 0


@dataclass
class SceneData:
    # triangle soup (world space)
    positions: np.ndarray  # [V, 3]
    faces: np.ndarray  # [F, 3]
    normals: np.ndarray  # [V, 3] shading normals
    texcoords: np.ndarray  # [V, 2]
    tri_mat: np.ndarray  # [F]
    tri_emitter: np.ndarray  # [F], -1 if not emissive
    materials: MaterialTable = None
    emitters: EmitterTable = None
    textures: TextureBuilder = None
    sensor: dict = field(default_factory=dict)
    film: dict = field(default_factory=dict)
    integrator: dict = field(default_factory=dict)
    sampler: dict = field(default_factory=dict)
    env_emitter: object = None
    delta_emitters: list = field(default_factory=list)
    media: list = field(default_factory=list)
    tri_medium: np.ndarray = None  # [F] interior medium id, -1 = none
    aabb_min: np.ndarray = None
    aabb_max: np.ndarray = None

    @property
    def num_tris(self):
        return len(self.faces)


def _resolve_xfov(sensor_props, W, H):
    """PerspectiveCamera fovAxis handling (librender/sensor.cpp:241-276)."""
    aspect = W / H
    fov = float(sensor_props.get("fov", 0.0))
    axis = str(sensor_props.get("fovAxis", "x")).lower()
    if "focalLength" in sensor_props:
        fl = float(str(sensor_props["focalLength"]).replace("mm", ""))
        fov = 2 * np.rad2deg(np.arctan(np.sqrt(36.0**2 + 24.0**2) / (2 * fl)))
        axis = "diagonal"
    if axis == "smaller":
        axis = "y" if aspect > 1 else "x"
    elif axis == "larger":
        axis = "x" if aspect > 1 else "y"
    if axis == "x":
        return fov
    if axis == "y":
        t = np.tan(np.deg2rad(fov) / 2) * aspect
        return 2 * np.rad2deg(np.arctan(t))
    if axis == "diagonal":
        diag = np.sqrt(1 + 1 / (aspect * aspect))
        t = np.tan(np.deg2rad(fov) / 2) / diag
        return 2 * np.rad2deg(np.arctan(t))
    raise ValueError(f"bad fovAxis {axis}")


def build_scene(xml: SceneXML, missing_ok=True) -> SceneData:
    textures = TextureBuilder(xml)
    mats = MaterialBuilder(textures)

    all_pos, all_faces, all_norm, all_uv = [], [], [], []
    tri_mat, tri_emitter, tri_medium = [], [], []
    emitter_rows = []
    media_rows = []
    vert_base = 0

    def add_medium(spec):
        """homogeneous medium (src/medium/homogeneous.cpp): sigmaS+sigmaA
        or sigmaT+albedo, x scale; phase child (isotropic default, hg g)."""
        if spec.otype != "homogeneous":
            raise NotImplementedError(f"medium type {spec.otype!r}")
        pr = spec.props
        scale = float(pr.get("scale", 1.0))
        if "sigmaT" in pr or "albedo" in pr:
            st = _rgb(pr.get("sigmaT"), [1, 1, 1]) * scale
            al = _rgb(pr.get("albedo"), [0.5, 0.5, 0.5])
        else:
            ss = _rgb(pr.get("sigmaS"), [0.5, 0.5, 0.5]) * scale
            sa = _rgb(pr.get("sigmaA"), [0.5, 0.5, 0.5]) * scale
            st = ss + sa
            al = np.where(st > 0, ss / np.maximum(st, 1e-30), 0.0)
        g = 0.0
        ph = spec.child("phase")
        if ph is not None and ph.otype == "hg":
            g = float(ph.props.get("g", 0.8))
        media_rows.append(dict(sigma_t=st, albedo=al, g=g))
        return len(media_rows) - 1

    env_emitter = None
    delta_emitters = []
    for em in xml.root.children_of("emitter"):
        t = em.otype
        p = em.props
        if t in ("envmap", "constant", "sky", "sun", "sunsky"):
            env_emitter = em  # handled by emitters.envmap / sunsky
        elif t == "point":
            delta_emitters.append(dict(
                type=0,
                position=_rgb(p.get("position"), [0, 0, 0]),
                intensity=_rgb(p.get("intensity"), [1, 1, 1]),
            ))
        elif t == "spot":
            M = np.asarray(p.get("toWorld", np.eye(4)))
            cut = float(p.get("cutoffAngle", 20.0))
            delta_emitters.append(dict(
                type=1,
                position=M[:3, 3],
                direction=M[:3, :3] @ np.array([0.0, 0.0, 1.0]),
                intensity=_rgb(p.get("intensity"), [1, 1, 1]),
                cutoff_deg=cut,
                beamwidth_deg=float(p.get("beamWidth", cut * 3.0 / 4.0)),
            ))
        elif t == "directional":
            delta_emitters.append(dict(
                type=2,
                direction=_rgb(p.get("direction"), [0, 0, 1]),
                intensity=_rgb(p.get("irradiance"), [1, 1, 1]),
            ))
        else:
            raise NotImplementedError(f"scene-level emitter {t!r}")

    for shape in xml.root.children_of("shape"):
        try:
            mesh = build_shape(shape, xml)
        except FileNotFoundError:
            if missing_ok:
                continue
            raise

        bspec = shape.child("bsdf")
        mat_id = mats.add(bspec if bspec is not None else _default_bsdf())

        espec = shape.child("emitter")
        emitter_id = -1
        if espec is not None:
            if espec.otype != "area":
                raise NotImplementedError(f"shape emitter {espec.otype!r}")
            radiance = _rgb(espec.props.get("radiance"), [1, 1, 1])
            fn, areas = mesh.face_normals_areas()
            total = areas.sum()
            emitter_rows.append(
                dict(
                    radiance=radiance,
                    tri_start=len(tri_mat),
                    n_tris=len(mesh.faces),
                    areas=areas,
                    inv_area=1.0 / max(total, 1e-30),
                )
            )
            emitter_id = len(emitter_rows) - 1

        F = len(mesh.faces)
        all_pos.append(mesh.positions)
        all_faces.append(mesh.faces + vert_base)
        all_norm.append(
            mesh.normals
            if mesh.normals is not None
            else np.zeros_like(mesh.positions)
        )
        uv = (
            mesh.texcoords
            if mesh.texcoords is not None
            else np.zeros((len(mesh.positions), 2))
        )
        all_uv.append(uv)
        tri_mat.extend([mat_id] * F)
        tri_emitter.extend([emitter_id] * F)
        med_spec = shape.child("medium")
        med_id = add_medium(med_spec) if med_spec is not None else -1
        tri_medium.extend([med_id] * F)
        vert_base += len(mesh.positions)

    positions = np.concatenate(all_pos) if all_pos else np.zeros((0, 3))
    faces = np.concatenate(all_faces) if all_faces else np.zeros((0, 3), np.int32)
    normals = np.concatenate(all_norm) if all_norm else np.zeros((0, 3))
    texcoords = np.concatenate(all_uv) if all_uv else np.zeros((0, 2))

    # emitter CDFs over triangle areas (TriMesh::samplePosition semantics)
    offs, cnts, ids, cdfs, invs, rads = [], [], [], [], [], []
    pos = 0
    for row in emitter_rows:
        areas = row["areas"]
        cdf = np.cumsum(areas)
        cdf = cdf / cdf[-1]
        offs.append(pos)
        cnts.append(len(areas))
        ids.extend(range(row["tri_start"], row["tri_start"] + row["n_tris"]))
        cdfs.extend(cdf)
        invs.append(row["inv_area"])
        rads.append(row["radiance"])
        pos += len(areas)
    emitters = EmitterTable(
        radiance=np.array(rads).reshape(-1, 3),
        tri_offset=np.array(offs, np.int32),
        tri_count=np.array(cnts, np.int32),
        tri_ids=np.array(ids, np.int32),
        tri_cdf=np.array(cdfs),
        inv_area=np.array(invs),
        num=len(emitter_rows),
    )

    sensor_spec = xml.root.child("sensor")
    film_spec = sensor_spec.child("film") if sensor_spec else None
    sampler_spec = sensor_spec.child("sampler") if sensor_spec else None
    rfilter_spec = film_spec.child("rfilter") if film_spec else None
    integrator_spec = xml.root.child("integrator")

    W = int(film_spec.props.get("width", 768)) if film_spec else 768
    H = int(film_spec.props.get("height", 576)) if film_spec else 576

    sensor = {}
    if sensor_spec is not None:
        sensor = dict(sensor_spec.props)
        sensor["type"] = sensor_spec.otype
        sensor["to_world"] = sensor_spec.props.get("toWorld", np.eye(4))
        sensor["xfov"] = _resolve_xfov(sensor_spec.props, W, H)
        sensor["near_clip"] = float(sensor_spec.props.get("nearClip", 1e-2))
        sensor["far_clip"] = float(sensor_spec.props.get("farClip", 1e4))

    film = dict(width=W, height=H)
    if film_spec is not None:
        film.update(film_spec.props)
    film["rfilter"] = rfilter_spec.otype if rfilter_spec is not None else "gaussian"

    if positions.size:
        aabb_min = positions.min(axis=0)
        aabb_max = positions.max(axis=0)
    else:
        aabb_min = np.zeros(3)
        aabb_max = np.ones(3)

    return SceneData(
        positions=positions,
        faces=faces,
        normals=normals,
        texcoords=texcoords,
        tri_mat=np.array(tri_mat, np.int32),
        tri_emitter=np.array(tri_emitter, np.int32),
        materials=mats.finalize(),
        emitters=emitters,
        textures=textures,
        sensor=sensor,
        film=film,
        integrator=(
            dict(integrator_spec.props, type=integrator_spec.otype)
            if integrator_spec
            else {"type": "path"}
        ),
        sampler=(
            dict(sampler_spec.props, type=sampler_spec.otype)
            if sampler_spec
            else {"type": "independent", "sampleCount": 4}
        ),
        env_emitter=env_emitter,
        delta_emitters=delta_emitters,
        media=media_rows,
        tri_medium=np.array(tri_medium, np.int32),
        aabb_min=aabb_min,
        aabb_max=aabb_max,
    )


_DEFAULT_BSDF = None


def _default_bsdf():
    global _DEFAULT_BSDF
    if _DEFAULT_BSDF is None:
        from .xml_parser import PluginSpec

        _DEFAULT_BSDF = PluginSpec("bsdf", "diffuse")
    return _DEFAULT_BSDF


def load_scene(path, defaults=None, missing_ok=True) -> SceneData:
    return build_scene(SceneXML(path, defaults), missing_ok=missing_ok)

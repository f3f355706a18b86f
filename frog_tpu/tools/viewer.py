"""Standalone HTML viewer for a registered group — the functional core of
the reference's L5 visualization layer (js/pointsViewer.js:1-101 scope,
plus the residual-inspection affordances of
js/groupwiseDeformableRegistration.js: per-point error coloring and a
linear-vs-final state toggle).

Instead of the desk-client three.js apps, this writes ONE self-contained
HTML file (inline WebGL renderer, base64 float data, no network or
external libraries) so the result opens anywhere, including offline.
"""
from __future__ import annotations

import base64
import json
import os

import numpy as np

__all__ = ["export_group_viewer"]


def _colors(n):
    """Distinct hues around the wheel."""
    out = []
    for i in range(n):
        h = (i * 0.618033988749895) % 1.0
        x = 1 - abs((h * 6) % 2 - 1)
        rgb = [(1, x, 0), (x, 1, 0), (0, 1, x), (0, x, 1), (x, 0, 1), (1, 0, x)][
            int(h * 6) % 6
        ]
        out.append([0.25 + 0.75 * c for c in rgb])
    return out


def _b64(a):
    return base64.b64encode(np.ascontiguousarray(a, "<f4").tobytes()).decode()


def _link_errors(graph, clouds):
    """Per-point mean distance to linked partners in the given space —
    the per-point residual of errorMaps (imageGroup.cxx:475-567), here on
    the keypoints themselves."""
    n = len(clouds)
    sums = [np.zeros(len(c), np.float64) for c in clouds]
    cnts = [np.zeros(len(c), np.int64) for c in clouds]
    for (i, j), m in graph.matches.items():
        if m.shape[0] == 0:
            continue
        d = np.linalg.norm(
            clouds[i][m[:, 0]] - clouds[j][m[:, 1]], axis=1
        )
        np.add.at(sums[i], m[:, 0], d)
        np.add.at(cnts[i], m[:, 0], 1)
        np.add.at(sums[j], m[:, 1], d)
        np.add.at(cnts[j], m[:, 1], 1)
    return [
        (s / np.maximum(c, 1)).astype(np.float32) for s, c in zip(sums, cnts)
    ]


def export_group_viewer(
    run_dir: str,
    output: str | None = None,
    max_points: int = 5000,
    pairs_file: str = "pairs.bin",
    transforms_dir: str = "transforms",
):
    """Render the group from a run directory: each image's keypoints pushed
    through its saved transform chain into the common space, with a
    before/after toggle (chain trimmed to the linear transform vs the full
    chain) and link-residual heat coloring.

    Returns the written HTML path.
    """
    import jax.numpy as jnp

    from ..io.pairs import read_pairs
    from ..transforms.chain import TransformChain
    from ..transforms.io import read_transform

    graph = read_pairs(os.path.join(run_dir, pairs_file))
    full, linear, names = [], [], []
    for i, img in enumerate(graph.images):
        xyz = np.asarray(img.xyz, np.float32)
        fin = lin = xyz
        tf = os.path.join(run_dir, transforms_dir, f"{i}.json")
        if os.path.exists(tf):
            chain = read_transform(tf)
            fin = np.asarray(chain(jnp.asarray(xyz)), np.float32)
            trimmed = TransformChain(transforms=chain.transforms[:1])
            lin = np.asarray(trimmed(jnp.asarray(xyz)), np.float32)
        full.append(fin)
        linear.append(lin)
        names.append(img.name or f"image {i}")

    err_fin = _link_errors(graph, full)
    err_lin = _link_errors(graph, linear)
    # one shared heat scale: the linear state's p95 residual, so the
    # deformable improvement reads as the cloud cooling down
    all_lin = np.concatenate(err_lin) if err_lin else np.zeros(1)
    escale = float(np.percentile(all_lin, 95) + 1e-9)

    keep_idx = []
    for c in full:
        step = max(1, -(-c.shape[0] // max_points))
        keep_idx.append(np.arange(0, c.shape[0], step))

    center = np.concatenate([c[k] for c, k in zip(full, keep_idx)]).mean(axis=0)
    radius = float(
        np.percentile(
            np.linalg.norm(
                np.concatenate([c[k] for c, k in zip(full, keep_idx)]) - center,
                axis=1,
            ),
            95,
        )
        + 1e-3
    )
    data = []
    for i, col in enumerate(_colors(len(full))):
        k = keep_idx[i]
        data.append(
            {
                "name": names[i],
                "count": int(len(k)),
                "color": col,
                "fin": _b64(full[i][k] - center),
                "lin": _b64(linear[i][k] - center),
                "efin": _b64(np.clip(err_fin[i][k] / escale, 0, 1)),
                "elin": _b64(np.clip(err_lin[i][k] / escale, 0, 1)),
            }
        )
    stats = {
        "escale": escale,
        "mean_lin": float(all_lin.mean()),
        "mean_fin": float(np.concatenate(err_fin).mean()) if err_fin else 0.0,
    }
    html = (
        _TEMPLATE.replace("/*DATA*/", json.dumps(data))
        .replace("/*RADIUS*/", repr(radius))
        .replace("/*STATS*/", json.dumps(stats))
    )
    out = output or os.path.join(run_dir, "view.html")
    with open(out, "w") as f:
        f.write(html)
    return out


_TEMPLATE = """<!doctype html>
<html><head><meta charset="utf-8"><title>frog-tpu group viewer</title>
<style>
 body{margin:0;background:#101014;color:#ddd;font:13px sans-serif;overflow:hidden}
 #panel{position:fixed;top:8px;left:8px;background:#1c1c22cc;padding:8px 12px;
        border-radius:6px;max-height:90vh;overflow:auto}
 #panel label{display:block;cursor:pointer;margin:2px 0}
 .sw{display:inline-block;width:10px;height:10px;margin-right:6px;border-radius:2px}
 .grp{margin:6px 0;padding-top:6px;border-top:1px solid #333}
 .grp label{display:inline-block;margin-right:10px}
 canvas{display:block}
</style></head><body>
<canvas id="c"></canvas><div id="panel"><b>frog-tpu group</b><br>
<span style="opacity:.6">drag: orbit &middot; wheel: zoom</span>
<div class="grp">state:
 <label><input type="radio" name="st" value="lin">linear</label>
 <label><input type="radio" name="st" value="fin" checked>final</label></div>
<div class="grp">color:
 <label><input type="radio" name="cm" value="img" checked>by image</label>
 <label><input type="radio" name="cm" value="err">residual heat</label></div>
<div class="grp" id="stats"></div>
</div>
<script>
const DATA = /*DATA*/;
const RADIUS = /*RADIUS*/;
const STATS = /*STATS*/;
let STATE = 'fin', CMODE = 0;
const canvas = document.getElementById('c');
const gl = canvas.getContext('webgl');
const vsrc = `attribute vec3 p;attribute float e;uniform mat4 mvp;
 uniform float ps;varying float ve;
 void main(){gl_Position=mvp*vec4(p,1.0);gl_PointSize=ps;ve=e;}`;
const fsrc = `precision mediump float;uniform vec3 col;uniform float cmode;
 varying float ve;
 void main(){vec2 d=gl_PointCoord-vec2(0.5);
 if(dot(d,d)>0.25)discard;
 vec3 heat=mix(vec3(0.15,0.35,1.0),vec3(1.0,0.2,0.1),ve);
 gl_FragColor=vec4(mix(col,heat,cmode),0.85);}`;
function sh(t,s){const o=gl.createShader(t);gl.shaderSource(o,s);
 gl.compileShader(o);return o;}
const prog = gl.createProgram();
gl.attachShader(prog, sh(gl.VERTEX_SHADER, vsrc));
gl.attachShader(prog, sh(gl.FRAGMENT_SHADER, fsrc));
gl.linkProgram(prog); gl.useProgram(prog);
const loc_p = gl.getAttribLocation(prog,'p');
const loc_e = gl.getAttribLocation(prog,'e');
const u_mvp = gl.getUniformLocation(prog,'mvp');
const u_col = gl.getUniformLocation(prog,'col');
const u_ps = gl.getUniformLocation(prog,'ps');
const u_cm = gl.getUniformLocation(prog,'cmode');
function vbo(b64){
  const bytes = atob(b64);
  const buf = new Uint8Array(bytes.length);
  for(let i=0;i<bytes.length;i++) buf[i]=bytes.charCodeAt(i);
  const v = gl.createBuffer();
  gl.bindBuffer(gl.ARRAY_BUFFER, v);
  gl.bufferData(gl.ARRAY_BUFFER, new Float32Array(buf.buffer), gl.STATIC_DRAW);
  return v;
}
const clouds = DATA.map(d=>({
  n:d.count, color:d.color, visible:true, name:d.name,
  fin:vbo(d.fin), lin:vbo(d.lin), efin:vbo(d.efin), elin:vbo(d.elin)}));
const panel = document.getElementById('panel');
clouds.forEach((c,i)=>{
  const l=document.createElement('label');
  const b=document.createElement('input');b.type='checkbox';b.checked=true;
  b.onchange=()=>{c.visible=b.checked;};
  const s=document.createElement('span');s.className='sw';
  s.style.background=`rgb(${c.color.map(v=>v*255|0).join(',')})`;
  l.appendChild(b);l.appendChild(s);
  l.appendChild(document.createTextNode(`${c.name} (${c.n})`));
  panel.appendChild(l);
});
document.getElementById('stats').textContent =
  `mean residual: linear ${STATS.mean_lin.toFixed(2)} -> final `+
  `${STATS.mean_fin.toFixed(2)} (heat scale ${STATS.escale.toFixed(2)})`;
for(const r of document.querySelectorAll('input[name=st]'))
  r.onchange=()=>{STATE=r.value;};
for(const r of document.querySelectorAll('input[name=cm]'))
  r.onchange=()=>{CMODE=(r.value==='err')?1:0;};
let theta=0.5, phi=0.4, dist=RADIUS*3;
canvas.onmousedown=e=>{
  const sx=e.clientX, sy=e.clientY, t0=theta, p0=phi;
  const mv=ev=>{theta=t0+(ev.clientX-sx)*0.008;
    phi=Math.max(-1.5,Math.min(1.5,p0+(ev.clientY-sy)*0.008));};
  const up=()=>{removeEventListener('mousemove',mv);removeEventListener('mouseup',up);};
  addEventListener('mousemove',mv);addEventListener('mouseup',up);};
canvas.onwheel=e=>{dist*=Math.exp(e.deltaY*0.001);e.preventDefault();};
function mat(){
  const a=Math.cos(theta),b=Math.sin(theta),c=Math.cos(phi),d=Math.sin(phi);
  const eye=[dist*c*b, dist*d, dist*c*a];
  const f=norm(neg(eye)), r=norm(cross(f,[0,1,0])), u=cross(r,f);
  const view=[r[0],u[0],-f[0],0, r[1],u[1],-f[1],0, r[2],u[2],-f[2],0,
    -dot(r,eye),-dot(u,eye),dot(f,eye),1];
  const asp=canvas.width/canvas.height, fy=1/Math.tan(0.4), n=RADIUS*0.01, fr=RADIUS*50;
  const proj=[fy/asp,0,0,0, 0,fy,0,0, 0,0,(fr+n)/(n-fr),-1, 0,0,2*fr*n/(n-fr),0];
  return mul(proj,view);
}
function neg(v){return v.map(x=>-x)}
function dot(a,b){return a[0]*b[0]+a[1]*b[1]+a[2]*b[2]}
function cross(a,b){return [a[1]*b[2]-a[2]*b[1],a[2]*b[0]-a[0]*b[2],a[0]*b[1]-a[1]*b[0]]}
function norm(v){const l=Math.hypot(...v);return v.map(x=>x/l)}
function mul(a,b){const o=new Array(16).fill(0);
 for(let i=0;i<4;i++)for(let j=0;j<4;j++)for(let k=0;k<4;k++)
   o[j*4+i]+=a[k*4+i]*b[j*4+k];return o;}
function draw(){
  canvas.width=innerWidth; canvas.height=innerHeight;
  gl.viewport(0,0,canvas.width,canvas.height);
  gl.clearColor(0.063,0.063,0.078,1); gl.clear(gl.COLOR_BUFFER_BIT);
  gl.uniformMatrix4fv(u_mvp,false,new Float32Array(mat()));
  gl.uniform1f(u_ps, 3.0);
  gl.uniform1f(u_cm, CMODE);
  for(const c of clouds){
    if(!c.visible) continue;
    gl.bindBuffer(gl.ARRAY_BUFFER, STATE==='fin'?c.fin:c.lin);
    gl.enableVertexAttribArray(loc_p);
    gl.vertexAttribPointer(loc_p,3,gl.FLOAT,false,0,0);
    gl.bindBuffer(gl.ARRAY_BUFFER, STATE==='fin'?c.efin:c.elin);
    gl.enableVertexAttribArray(loc_e);
    gl.vertexAttribPointer(loc_e,1,gl.FLOAT,false,0,0);
    gl.uniform3fv(u_col,c.color);
    gl.drawArrays(gl.POINTS,0,c.n);
  }
  requestAnimationFrame(draw);
}
draw();
</script></body></html>
"""

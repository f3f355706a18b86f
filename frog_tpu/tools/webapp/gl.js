/* Minimal WebGL scene for the frog-tpu apps: orbit camera, colored
 * point clouds, and textured quads (volume slices) — the display layer
 * the reference builds from three.js (desk.THREE.Viewer).  Kept
 * dependency-free so the apps work offline. */
"use strict";
function GLView(canvas) {
  const gl = canvas.getContext("webgl");
  const PV = `attribute vec3 p; uniform mat4 mvp; uniform vec3 off, scl;
    uniform float ps; void main(){
    gl_Position = mvp * vec4(p * scl + off, 1.0); gl_PointSize = ps; }`;
  const PF = `precision mediump float; uniform vec3 col; uniform float alpha;
    void main(){ vec2 d = gl_PointCoord - vec2(0.5);
    if (dot(d,d) > 0.25) discard; gl_FragColor = vec4(col, alpha); }`;
  const QV = `attribute vec3 p; attribute vec2 t; uniform mat4 mvp;
    uniform vec3 off, scl; varying vec2 vt; void main(){
    gl_Position = mvp * vec4(p * scl + off, 1.0); vt = t; }`;
  const QF = `precision mediump float; uniform sampler2D tex;
    uniform float contrast; varying vec2 vt; void main(){
    float g = texture2D(tex, vt).r * contrast;
    gl_FragColor = vec4(g, g, g, 1.0); }`;
  const LV = `attribute vec3 p; uniform mat4 mvp; void main(){
    gl_Position = mvp * vec4(p, 1.0); }`;
  const LF = `precision mediump float; uniform vec3 col; uniform float alpha;
    void main(){ gl_FragColor = vec4(col, alpha); }`;

  function prog(vs, fs) {
    const mk = (t, s) => { const o = gl.createShader(t);
      gl.shaderSource(o, s); gl.compileShader(o); return o; };
    const p = gl.createProgram();
    gl.attachShader(p, mk(gl.VERTEX_SHADER, vs));
    gl.attachShader(p, mk(gl.FRAGMENT_SHADER, fs));
    gl.linkProgram(p);
    return p;
  }
  const pPts = prog(PV, PF), pQuad = prog(QV, QF), pLine = prog(LV, LF);
  const u = (p, n) => gl.getUniformLocation(p, n);
  const a = (p, n) => gl.getAttribLocation(p, n);

  const objects = {};
  let radius = 100, center = [0, 0, 0];
  let theta = 0.0, phi = 0.25, dist = 300;
  let contrast = 1.0;

  canvas.onmousedown = (e) => {
    const sx = e.clientX, sy = e.clientY, t0 = theta, p0 = phi;
    const mv = (ev) => { theta = t0 + (ev.clientX - sx) * 0.008;
      phi = Math.max(-1.5, Math.min(1.5, p0 + (ev.clientY - sy) * 0.008)); };
    const up = () => { removeEventListener("mousemove", mv);
      removeEventListener("mouseup", up); };
    addEventListener("mousemove", mv); addEventListener("mouseup", up);
  };
  canvas.onwheel = (e) => { dist *= Math.exp(e.deltaY * 0.001); e.preventDefault(); };

  function vbo(arr) {
    const v = gl.createBuffer();
    gl.bindBuffer(gl.ARRAY_BUFFER, v);
    gl.bufferData(gl.ARRAY_BUFFER, arr, gl.STATIC_DRAW);
    return v;
  }

  function addPoints(name, xyz, color, size) {
    const o = { kind: "points", buf: vbo(xyz), n: xyz.length / 3,
      color: color || [1, 1, 1], pos: [0, 0, 0], scale: [1, 1, 1],
      visible: true, size: size || 3, alpha: 0.85 };
    objects[name] = o; return o;
  }

  /* Textured quad in the x-z plane (front view), w x h world units. */
  function addImage(name, url, w, h) {
    const tex = gl.createTexture();
    gl.bindTexture(gl.TEXTURE_2D, tex);
    gl.texImage2D(gl.TEXTURE_2D, 0, gl.LUMINANCE, 1, 1, 0, gl.LUMINANCE,
      gl.UNSIGNED_BYTE, new Uint8Array([40]));
    // NPOT-safe filtering (also completes the 1x1 placeholder)
    gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_MIN_FILTER, gl.LINEAR);
    gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_WRAP_S, gl.CLAMP_TO_EDGE);
    gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_WRAP_T, gl.CLAMP_TO_EDGE);
    const img = new Image();
    img.onload = () => {
      gl.bindTexture(gl.TEXTURE_2D, tex);
      gl.texImage2D(gl.TEXTURE_2D, 0, gl.LUMINANCE, gl.LUMINANCE,
        gl.UNSIGNED_BYTE, img);
      gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_MIN_FILTER, gl.LINEAR);
      gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_WRAP_S, gl.CLAMP_TO_EDGE);
      gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_WRAP_T, gl.CLAMP_TO_EDGE);
    };
    img.src = url;
    const x = w / 2, z = h / 2;
    const verts = new Float32Array([
      -x, 0, -z, 0, 0,  x, 0, -z, 1, 0,  x, 0, z, 1, 1,
      -x, 0, -z, 0, 0,  x, 0, z, 1, 1,  -x, 0, z, 0, 1]);
    const o = { kind: "quad", buf: vbo(verts), tex, n: 6,
      pos: [0, 0, 0], scale: [1, 1, 1], visible: true };
    objects[name] = o; return o;
  }

  function addLines(name, xyz, color) {
    const o = { kind: "lines", buf: vbo(xyz), n: xyz.length / 3,
      color: color || [1, 0.3, 0.2], visible: true, alpha: 0.5 };
    objects[name] = o; return o;
  }

  function setLines(name, xyz) {
    const o = objects[name];
    gl.bindBuffer(gl.ARRAY_BUFFER, o.buf);
    gl.bufferData(gl.ARRAY_BUFFER, xyz, gl.STATIC_DRAW);
    o.n = xyz.length / 3;
  }

  function fit(r, c) { radius = r; center = c || [0, 0, 0]; dist = r * 2.5; }
  function setContrast(c) { contrast = c; }

  const neg = (v) => v.map((x) => -x);
  const dot = (x, y) => x[0] * y[0] + x[1] * y[1] + x[2] * y[2];
  const cross = (x, y) => [x[1] * y[2] - x[2] * y[1],
    x[2] * y[0] - x[0] * y[2], x[0] * y[1] - x[1] * y[0]];
  const norm = (v) => { const l = Math.hypot(...v); return v.map((x) => x / l); };
  const mul = (A, B) => { const o = new Array(16).fill(0);
    for (let i = 0; i < 4; i++) for (let j = 0; j < 4; j++)
      for (let k = 0; k < 4; k++) o[j * 4 + i] += A[k * 4 + i] * B[j * 4 + k];
    return o; };

  function mat() {
    const ca = Math.cos(theta), sa = Math.sin(theta);
    const cp = Math.cos(phi), sp = Math.sin(phi);
    // front view = -y toward the scene, z up (reference cameraFront
    // [0,1,0] / cameraUp [0,0,1])
    const eye = [center[0] + dist * cp * sa, center[1] - dist * cp * ca,
      center[2] + dist * sp];
    const f = norm([center[0] - eye[0], center[1] - eye[1], center[2] - eye[2]]);
    const r = norm(cross(f, [0, 0, 1]));
    const up = cross(r, f);
    const view = [r[0], up[0], -f[0], 0, r[1], up[1], -f[1], 0,
      r[2], up[2], -f[2], 0, -dot(r, eye), -dot(up, eye), dot(f, eye), 1];
    const asp = canvas.width / canvas.height, fy = 1 / Math.tan(0.4);
    const n = radius * 0.01, fr = radius * 80;
    const proj = [fy / asp, 0, 0, 0, 0, fy, 0, 0,
      0, 0, (fr + n) / (n - fr), -1, 0, 0, 2 * fr * n / (n - fr), 0];
    return mul(proj, view);
  }

  function draw() {
    canvas.width = canvas.clientWidth; canvas.height = canvas.clientHeight;
    gl.viewport(0, 0, canvas.width, canvas.height);
    gl.clearColor(0.063, 0.063, 0.078, 1);
    gl.clear(gl.COLOR_BUFFER_BIT);
    gl.enable(gl.BLEND);
    gl.blendFunc(gl.SRC_ALPHA, gl.ONE_MINUS_SRC_ALPHA);
    const m = new Float32Array(mat());
    for (const name of Object.keys(objects)) {
      const o = objects[name];
      if (!o.visible) continue;
      if (o.kind === "quad") {
        gl.useProgram(pQuad);
        gl.uniformMatrix4fv(u(pQuad, "mvp"), false, m);
        gl.uniform3fv(u(pQuad, "off"), o.pos);
        gl.uniform3fv(u(pQuad, "scl"), o.scale);
        gl.uniform1f(u(pQuad, "contrast"), contrast);
        gl.bindBuffer(gl.ARRAY_BUFFER, o.buf);
        const lp = a(pQuad, "p"), lt = a(pQuad, "t");
        gl.enableVertexAttribArray(lp);
        gl.vertexAttribPointer(lp, 3, gl.FLOAT, false, 20, 0);
        gl.enableVertexAttribArray(lt);
        gl.vertexAttribPointer(lt, 2, gl.FLOAT, false, 20, 12);
        gl.bindTexture(gl.TEXTURE_2D, o.tex);
        gl.drawArrays(gl.TRIANGLES, 0, o.n);
      } else if (o.kind === "points") {
        gl.useProgram(pPts);
        gl.uniformMatrix4fv(u(pPts, "mvp"), false, m);
        gl.uniform3fv(u(pPts, "off"), o.pos);
        gl.uniform3fv(u(pPts, "scl"), o.scale);
        gl.uniform3fv(u(pPts, "col"), o.color);
        gl.uniform1f(u(pPts, "ps"), o.size);
        gl.uniform1f(u(pPts, "alpha"), o.alpha);
        gl.bindBuffer(gl.ARRAY_BUFFER, o.buf);
        const lp = a(pPts, "p");
        gl.enableVertexAttribArray(lp);
        gl.vertexAttribPointer(lp, 3, gl.FLOAT, false, 0, 0);
        gl.drawArrays(gl.POINTS, 0, o.n);
      } else {
        gl.useProgram(pLine);
        gl.uniformMatrix4fv(u(pLine, "mvp"), false, m);
        gl.uniform3fv(u(pLine, "col"), o.color);
        gl.uniform1f(u(pLine, "alpha"), o.alpha);
        gl.bindBuffer(gl.ARRAY_BUFFER, o.buf);
        const lp = a(pLine, "p");
        gl.enableVertexAttribArray(lp);
        gl.vertexAttribPointer(lp, 3, gl.FLOAT, false, 0, 0);
        gl.drawArrays(gl.LINES, 0, o.n);
      }
    }
    requestAnimationFrame(draw);
  }
  draw();
  return { objects, addPoints, addImage, addLines, setLines, fit, setContrast };
}

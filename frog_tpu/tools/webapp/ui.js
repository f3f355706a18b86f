/* Shared UI scaffolding for the frog-tpu apps: volume list with
 * checkboxes, status line, log pane, slice-quad layout. */
"use strict";

function statusLine(text) {
  document.getElementById("status").textContent = text;
  const log = document.getElementById("log");
  if (log) {
    log.style.display = "block";
    const atEnd = log.scrollTop + log.clientHeight >= log.scrollHeight - 4;
    log.textContent += text + "\n";
    if (atEnd) log.scrollTop = log.scrollHeight;
  }
}

/* Populate #files with checkboxes; returns {selected: () => [paths]}. */
async function volumePicker(opts) {
  const el = document.getElementById("files");
  const volumes = await FROG.listVolumes();
  el.innerHTML = "<b>volumes</b> (" + volumes.length + ")<br>";
  const boxes = [];
  const max = (opts && opts.max) || Infinity;
  volumes.forEach((v, i) => {
    const l = document.createElement("label");
    const b = document.createElement("input");
    b.type = "checkbox"; b.checked = i < ((opts && opts.preselect) || 8);
    b.value = v;
    boxes.push(b);
    l.appendChild(b);
    l.appendChild(document.createTextNode(" " + v));
    el.appendChild(l);
  });
  return { selected: () => boxes.filter(b => b.checked).map(b => b.value).slice(0, max),
           all: volumes };
}

/* Lay volume slice quads on a row (the reference grid layout,
 * groupwiseDeformableRegistration.js:130,253-258).  Returns anchors:
 * [{obj, initial:[x,y,z]}] so registration output can move them. */
async function layoutVolumes(view, files) {
  // drop quads from a previous layout (selection may have changed)
  Object.keys(view.objects).filter(k => /^vol\d+$/.test(k))
    .forEach(k => delete view.objects[k]);
  const infos = await Promise.all(files.map(f => FROG.volumeInfo(f)));
  let maxw = 1;
  infos.forEach(info => {
    maxw = Math.max(maxw, info.shape[0] * info.spacing[0]);
  });
  const spacingX = maxw * 1.15;
  const anchors = [];
  files.forEach((f, i) => {
    const info = infos[i];
    const w = info.shape[0] * info.spacing[0];
    const h = info.shape[1] * info.spacing[1];
    const o = view.addImage("vol" + i, "/api/slice?file=" + encodeURIComponent(f), w, h);
    const initial = [(i - (files.length - 1) / 2) * spacingX, 0, 0];
    o.pos = initial.slice();
    anchors.push({ obj: o, initial, info });
  });
  view.fit(spacingX * files.length * 0.55 + maxw, [0, 0, 0]);
  return anchors;
}

/* Parse the registration stdout lines the reference app parses
 * (groupwiseDeformableRegistration.js:518-547): translation / scale
 * per image, E per iteration. */
function makeRegistrationParser(handlers) {
  let currentVolume = null;
  const num = (line) => line.split("=")[1].trim().split(/\s+/).map(parseFloat);
  return (line) => {
    if (line.includes("translation")) {
      const m = line.match(/\d+/);
      if (m) { currentVolume = +m[0];
        handlers.translation && handlers.translation(currentVolume, num(line)); }
    } else if (line.includes("scale") && currentVolume !== null) {
      handlers.scale && handlers.scale(currentVolume, num(line));
    } else if (line.startsWith("E = ")) {
      handlers.energy && handlers.energy(parseFloat(line.slice(4)));
    }
    handlers.line && handlers.line(line);
  };
}

/* Tiny sparkline for the energy curve. */
function sparkline(canvasId) {
  const c = document.getElementById(canvasId);
  const ctx = c.getContext("2d");
  const vals = [];
  return (v) => {
    vals.push(v);
    ctx.clearRect(0, 0, c.width, c.height);
    ctx.strokeStyle = "#2a6"; ctx.lineWidth = 1.5;
    const max = Math.max(...vals), min = Math.min(...vals);
    ctx.beginPath();
    vals.forEach((y, i) => {
      const px = (i / Math.max(vals.length - 1, 1)) * (c.width - 8) + 4;
      const py = c.height - 6 - ((y - min) / Math.max(max - min, 1e-9)) * (c.height - 12);
      i ? ctx.lineTo(px, py) : ctx.moveTo(px, py);
    });
    ctx.stroke();
    ctx.fillStyle = "#9ad";
    ctx.fillText("E " + v.toPrecision(4) + "  (" + vals.length + " iters)", 6, 12);
  };
}

/* FROG browser API — same surface as the reference's window.FROG
 * (js/lib/FROG.js:8-305): computeRigidGroupwiseRegistration,
 * DeformableGroupwiseRegistration (EventEmitter with log / matchLog /
 * registrationLog events), CommonSpaceMeanImage.  Instead of desk
 * actions it talks to the frog-tpu server's job API; the progress
 * events carry the same stdout lines the reference apps parse. */
"use strict";
(function () {

class EventEmitter {
  constructor() { this._h = {}; }
  on(name, fn) { (this._h[name] = this._h[name] || []).push(fn); return this; }
  emit(name, ...args) { (this._h[name] || []).forEach(fn => fn(...args)); }
}

const FROG = { EventEmitter };

FROG.startJob = async function (kind, params) {
  const r = await fetch("/api/jobs", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({ kind, params }),
  });
  const body = await r.json();
  if (!r.ok) throw new Error(body.error || r.statusText);
  return body.id;
};

/* Follow a job's SSE stream.  onLine(line, channel) fires for every
 * stdout line; resolves with the job result. */
FROG.followJob = function (id, onLine) {
  return new Promise((resolve, reject) => {
    const es = new EventSource(`/api/jobs/${id}/events`);
    es.onmessage = (m) => {
      const e = JSON.parse(m.data);
      if (e.type === "line" && onLine) onLine(e.text, e.channel);
      else if (e.type === "done") { es.close(); resolve(e.result); }
      else if (e.type === "error") { es.close(); reject(new Error(e.message)); }
    };
    es.onerror = () => {
      // EventSource reconnects on its own; a closed stream after "done"
      // already resolved, so only surface hard failures
      if (es.readyState === EventSource.CLOSED)
        reject(new Error("event stream closed"));
    };
  });
};

/* files: array of volume paths (relative to the server's data root).
 * Returns [{volume, translation: [tx, ty, tz, log s]}] —
 * FROG.js:8-27. */
FROG.computeRigidGroupwiseRegistration = async function (files, options) {
  const params = Object.assign({}, options || {}, { files });
  const id = await FROG.startJob("rigid", params);
  const result = await FROG.followJob(id, params.onLine);
  return files.map((file, index) => ({
    volume: file,
    translation: result.positions.slice(4 * index, 4 + 4 * index),
  }));
};

/* volumes: [{volume, translation}] like the reference; options:
 * {SURF3DParams, matchParams, registrationParams, computeAverage,
 * averageSpacing} — FROG.js:29-204. */
FROG.DeformableGroupwiseRegistration = class extends EventEmitter {
  constructor(volumes, options) {
    super();
    this.volumes = volumes;
    this.options = options || {};
  }
  async execute() {
    const o = this.options;
    // extractor rounds like the reference (FROG.js:62-92): RAW
    // subvolumes (SURF3D action with type: 1) and/or SURF; with both,
    // the server matches each set and merges the graphs (mergePairs)
    const extractors = [];
    if (o.useRAW) extractors.push(Object.assign({ type: 1 }, o.RAWParams));
    if (o.useSURF !== false || !extractors.length)
      extractors.push(o.SURF3DParams || {});
    const surf = extractors[extractors.length - 1];
    const match = o.matchParams || {};
    const reg = o.registrationParams || {};
    const params = {
      files: this.volumes.map(v => v.volume || v),
      numberOfPoints: surf.numberOfPoints,
      spacing: surf.spacing,
      threshold: surf.threshold,
      type: surf.type,
      distance: match.distance,
      distanceToSecond: match.distanceToSecond,
      linearIterations: reg.linearIterations,
      deformableLevels: reg.deformableLevels,
      deformableIterations: reg.deformableIterations,
      initialGridSize: reg.initialGridSize,
      computeAverage: o.computeAverage,
      averageSpacing: o.averageSpacing,
      extractors: extractors.length > 1 ? extractors : undefined,
    };
    this.emit("log", "Computing keypoints...");
    const id = await FROG.startJob("deformable", params);
    this.jobId = id;
    const result = await FROG.followJob(id, (line, channel) => {
      this.emit(channel, line);
      if (channel !== "log") this.emit("log", line);
    });
    this.emit("log", "Registration done");
    return { registration: { outputDirectory: result.outputDirectory, job: id },
             match: {}, volumes: result.volumes, measures: result.measures,
             averageVolume: result.averageVolume };
  }
};

/* opts: {registration: {job}, volumes?, spacing?} — FROG.js:207-305. */
FROG.CommonSpaceMeanImage = class extends EventEmitter {
  constructor(opts) { super(); this.opts = opts || {}; }
  async execute() {
    const o = this.opts;
    const id = await FROG.startJob("average", {
      registration: o.registration.job || o.registration,
      files: o.volumes ? o.volumes.map(v => v.volume || v) : undefined,
      spacing: o.spacing,
    });
    const result = await FROG.followJob(id, line => this.emit("log", line));
    return result;
  }
};

/* Small shared helpers for the apps. */
FROG.listVolumes = async function (dir) {
  const r = await fetch("/api/volumes" + (dir ? `?dir=${encodeURIComponent(dir)}` : ""));
  return (await r.json()).volumes;
};
FROG.volumeInfo = async function (file) {
  return (await fetch(`/api/volinfo?file=${encodeURIComponent(file)}`)).json();
};
FROG.points = async function (file, max) {
  return (await fetch(`/api/points?file=${encodeURIComponent(file)}&max=${max || 3000}`)).json();
};

window.FROG = FROG;
})();
